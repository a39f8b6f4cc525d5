"""Tracker tests: init search, correspondence validation, end-to-end
synthetic tracking (SURVEY.md §7 layer 5 + §4 golden-sequence strategy)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pf_monocular_pose_estimator_tpu.geometry import exp_se3, project
from pf_monocular_pose_estimator_tpu.io.metrics import (
    absolute_trajectory_error,
    orientation_error_deg,
)
from pf_monocular_pose_estimator_tpu.io.synthetic import (
    default_camera,
    demo_markers,
    make_orbit_sequence,
)
from pf_monocular_pose_estimator_tpu.ops.blob import Detections
from pf_monocular_pose_estimator_tpu.tracker import (
    TargetState,
    brute_force_histogram,
    check_correspondences,
    correspondences_from_histogram,
    initialise,
    make_tracker,
)
from pf_monocular_pose_estimator_tpu.utils import FailFlag, TrackerConfig


@pytest.fixture(scope="module")
def camera():
    return default_camera()


@pytest.fixture(scope="module")
def markers():
    return demo_markers()


@pytest.fixture(scope="module")
def config():
    return TrackerConfig(n_particles=500, min_blob_area=8.0)


def gt_pose(twist=(0.02, -0.01, 0.0, 0.3, -0.2, 0.25), z=1.4):
    p = np.array(exp_se3(jnp.asarray(twist, jnp.float32)))
    p[2, 3] += z
    return jnp.asarray(p)


def perfect_detections(camera, pose, markers, k_cap=16, permute=None, extra=0):
    uv = np.asarray(project(camera, pose, markers))
    if permute is not None:
        uv = uv[permute]
    m = uv.shape[0]
    xy = np.zeros((k_cap, 2), np.float32)
    xy[:m] = uv
    mask = np.zeros((k_cap,), bool)
    mask[: m + extra] = True
    if extra:
        rng = np.random.default_rng(0)
        xy[m : m + extra] = rng.uniform([100, 100], [650, 380], size=(extra, 2))
    z = jnp.zeros((k_cap,), bool)
    return Detections(
        xy=jnp.asarray(xy),
        xy_distorted=jnp.asarray(xy),
        mask=jnp.asarray(mask),
        area=jnp.where(jnp.asarray(mask), 30.0, 0.0),
        occluded=z,
        injected=z,
    )


def test_brute_force_histogram_votes_true_pairs(camera, markers, config):
    pose = gt_pose()
    perm = np.array([3, 1, 4, 0, 2])  # detection i shows marker perm[i]
    det = perfect_detections(camera, pose, markers, permute=np.argsort(perm))
    # detection j = marker perm^-1 ... build det k = uv[order[k]]
    hist = np.asarray(
        brute_force_histogram(camera, det, markers, jnp.ones(5, bool), config)
    )
    # Wrong permutations cast accidental votes (as in the reference); the
    # true pair must still rank in the top 2 of its row — joint extraction
    # (next test) resolves the rest.
    order = np.argsort(perm)  # det k shows marker order[k]
    for k in range(5):
        true_marker = order[k]
        top2 = np.argsort(-hist[k])[:2]
        assert true_marker in top2, (k, hist[k])
    # rows of invalid detections must be empty
    assert (hist[5:] == 0).all()


def test_correspondences_from_histogram_recovers_permutation(camera, markers, config):
    pose = gt_pose()
    order = np.array([2, 0, 3, 1, 4])
    det = perfect_detections(camera, pose, markers, permute=order)
    hist = brute_force_histogram(camera, det, markers, jnp.ones(5, bool), config)
    cands = correspondences_from_histogram(
        hist, det.mask, jnp.ones(5, bool), config, initialisation=True
    )
    assert bool(cands.valid[0])
    got = np.asarray(cands.det_for_marker[0])
    # marker order[k] appears as detection k => det_for_marker[order[k]] == k
    want = np.empty(5, np.int64)
    want[order] = np.arange(5)
    np.testing.assert_array_equal(got, want)


def test_check_correspondences_accepts_truth_rejects_garbage(camera, markers, config):
    pose = gt_pose()
    det = perfect_detections(camera, pose, markers)
    good = check_correspondences(
        camera, det.xy, det.mask, markers, jnp.ones(5, bool),
        jnp.arange(5, dtype=jnp.int32), jnp.asarray(5), config,
    )
    assert bool(good.success)
    np.testing.assert_allclose(np.asarray(good.pose), np.asarray(pose), atol=5e-2)
    assert int(good.num_valid) == 10  # all C(5,3) combos valid

    bad = check_correspondences(
        camera, det.xy, det.mask, markers, jnp.ones(5, bool),
        jnp.asarray([1, 0, 3, 2, 4], jnp.int32), jnp.asarray(5), config,
    )
    assert not bool(bad.success)


def test_initialise_from_perfect_detections(camera, markers, config):
    pose = gt_pose()
    det = perfect_detections(camera, pose, markers, permute=np.array([4, 2, 0, 1, 3]))
    from pf_monocular_pose_estimator_tpu.pf.soa import identity_bank16, unpack

    bank = identity_bank16(config.n_particles)
    res = initialise(camera, det, markers, jnp.ones(5, bool), bank, config)
    assert bool(res.success), f"flag={int(res.flag)}"
    np.testing.assert_allclose(np.asarray(res.pose), np.asarray(pose), atol=5e-2)
    # bank tail seeded with P3P solutions near the truth
    seeded = np.asarray(unpack(res.bank)[-5:])
    err = np.abs(seeded - np.asarray(pose)).max(axis=(-1, -2))
    assert err.min() < 0.2


def test_initialise_with_outliers(camera, markers, config):
    pose = gt_pose()
    from pf_monocular_pose_estimator_tpu.pf.soa import identity_bank16

    det = perfect_detections(camera, pose, markers, extra=2)
    bank = identity_bank16(config.n_particles)
    res = initialise(camera, det, markers, jnp.ones(5, bool), bank, config)
    assert bool(res.success), f"flag={int(res.flag)}"
    np.testing.assert_allclose(np.asarray(res.pose), np.asarray(pose), atol=6e-2)


def test_initialise_outliers_with_cluster_gate(camera, markers, config):
    """With the (reference-intended, default-disabled) cluster gate set to a
    meaningful radius, far-away spurious blobs cannot poison the vote
    histogram (pose_estimator.cpp:1567-1581)."""
    import dataclasses

    from pf_monocular_pose_estimator_tpu.pf.soa import identity_bank16

    cfg = dataclasses.replace(config, init_cluster_radius=150.0)
    pose = gt_pose()
    det = perfect_detections(camera, pose, markers, extra=3)
    bank = identity_bank16(cfg.n_particles)
    res = initialise(camera, det, markers, jnp.ones(5, bool), bank, cfg)
    assert bool(res.success), f"flag={int(res.flag)}"
    np.testing.assert_allclose(np.asarray(res.pose), np.asarray(pose), atol=6e-2)


def test_initialise_fails_cleanly_with_too_few(camera, markers, config):
    pose = gt_pose()
    det = perfect_detections(camera, pose, markers)
    from pf_monocular_pose_estimator_tpu.pf.soa import identity_bank16

    det = det._replace(mask=det.mask.at[3:].set(False))
    bank = identity_bank16(config.n_particles)
    res = initialise(camera, det, markers, jnp.ones(5, bool), bank, config)
    assert not bool(res.success)
    assert int(res.flag) == int(FailFlag.TOO_FEW_MARKERS_DETECTED)


# ------------------------------------------------------------ end-to-end


@pytest.mark.slow
def test_tracker_end_to_end_synthetic(camera, markers):
    config = TrackerConfig(
        n_particles=400,
        min_blob_area=8.0,
        pf_max_retries=20,
        max_correspondence_candidates=4,
    )
    seq = make_orbit_sequence(camera, markers, num_frames=30, fps=50.0)
    step = make_tracker(camera, markers, jnp.ones(5, bool), config)
    state = TargetState.create(config.n_particles, jax.random.PRNGKey(0))

    est = []
    flags = []
    updated = []
    for i in range(seq.frames.shape[0]):
        state, res = step(state, seq.frames[i], seq.times[i])
        est.append(np.asarray(res.pose))
        flags.append(int(res.fail_flag))
        updated.append(bool(res.pose_updated))

    est = np.stack(est)
    gt = np.asarray(seq.poses)
    mask = np.asarray(updated)
    assert mask[1:].all(), f"lost track: flags={flags}"
    ate = absolute_trajectory_error(est, gt, mask)
    oe = orientation_error_deg(est, gt, mask)
    assert ate < 0.01, f"ATE {ate*1000:.1f} mm too large (flags={flags})"
    assert oe < 1.5, f"orientation error {oe:.2f} deg too large"


def test_initialise_prefer_near_gate_semantics(camera, markers, config):
    """prefer_near (consistency-aware candidate selection): with the
    active flag OFF the result is bit-identical to prefer_near=None;
    with the flag ON at the true pose, the selected candidate stays
    validated and consistent; pointed far away with no consistent
    candidate it falls back to the rank-first choice."""
    pose = gt_pose()
    det = perfect_detections(camera, pose, markers, permute=np.array([4, 2, 0, 1, 3]))
    from pf_monocular_pose_estimator_tpu.pf.soa import identity_bank16

    bank = identity_bank16(config.n_particles)
    base = initialise(camera, det, markers, jnp.ones(5, bool), bank, config)

    t_gt = np.asarray(pose)[:3, 3]
    inactive = jnp.asarray([*t_gt, 0.0], jnp.float32)
    off = initialise(
        camera, det, markers, jnp.ones(5, bool), bank, config, prefer_near=inactive
    )
    np.testing.assert_array_equal(np.asarray(base.pose), np.asarray(off.pose))

    at_truth = jnp.asarray([*t_gt, 1.0], jnp.float32)
    near = initialise(
        camera, det, markers, jnp.ones(5, bool), bank, config, prefer_near=at_truth
    )
    assert bool(near.success)
    assert (
        np.linalg.norm(np.asarray(near.pose)[:3, 3] - t_gt)
        <= config.init_consistency_radius
    )

    far = jnp.asarray([10.0, 10.0, 10.0, 1.0], jnp.float32)
    fallback = initialise(
        camera, det, markers, jnp.ones(5, bool), bank, config, prefer_near=far
    )
    np.testing.assert_array_equal(np.asarray(base.pose), np.asarray(fallback.pose))


def test_ess_gated_resampling_skips_and_tracks():
    """resample_min_ess > 0 (TrackerConfig): frames whose weight spread
    is healthy skip the stratified resample + bank gather (the bank
    passes through), and tracking quality is preserved."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from pf_monocular_pose_estimator_tpu.io.synthetic import (
        default_camera,
        demo_markers,
        make_orbit_sequence,
    )
    from pf_monocular_pose_estimator_tpu.tracker import TargetState, make_tracker
    from pf_monocular_pose_estimator_tpu.utils import TrackerConfig

    camera, markers = default_camera(), demo_markers()
    mask = jnp.ones((markers.shape[0],), bool)
    seq = make_orbit_sequence(camera, markers, num_frames=10, fps=50.0)

    # near-zero threshold: ESS never falls below it, so every tracked
    # frame skips the resample (the bank passes through)
    config = TrackerConfig(
        n_particles=1024, min_blob_area=8.0, pf_max_retries=4,
        resample_min_ess=1e-6,
    )
    step = make_tracker(camera, markers, mask, config)
    state = TargetState.create(config.n_particles, jax.random.PRNGKey(0))
    tracked, skipped, errs = 0, 0, []
    for i in range(10):
        state, res = step(state, seq.frames[i], seq.times[i])
        if bool(res.pose_updated):
            tracked += 1
            errs.append(float(jnp.linalg.norm(res.pose[:3, 3] - seq.poses[i][:3, 3])))
            skipped += bool(jnp.all(state.resampled == state.bank))
    assert tracked >= 8
    assert skipped == tracked  # every tracked frame skipped the resample
    assert np.median(errs) < 0.03  # still detector-noise-limited

    # threshold above 1: ESS always falls below it, so resampling fires
    # every frame (gate-active but behaviourally parity)
    config2 = TrackerConfig(
        n_particles=1024, min_blob_area=8.0, pf_max_retries=4,
        resample_min_ess=1.0 + 1e-6,
    )
    step2 = make_tracker(camera, markers, mask, config2)
    state2 = TargetState.create(config2.n_particles, jax.random.PRNGKey(0))
    resampled_frames = 0
    for i in range(10):
        state2, res2 = step2(state2, seq.frames[i], seq.times[i])
        if bool(res2.pose_updated):
            resampled_frames += not bool(jnp.all(state2.resampled == state2.bank))
    assert resampled_frames >= 8


def test_coast_survives_isolated_rejects_then_resets():
    """pf_coast_frames (TrackerConfig): a mature track keeps its bank
    through up to N consecutive rejected frames (flag 40, pose not
    updated) instead of the reference's immediate full reset; one more
    rejection forces the reset; the parity preset resets immediately."""
    import jax
    import jax.numpy as jnp

    from pf_monocular_pose_estimator_tpu.io.synthetic import (
        default_camera,
        demo_markers,
        make_orbit_sequence,
    )
    from pf_monocular_pose_estimator_tpu.tracker import TargetState, make_tracker
    from pf_monocular_pose_estimator_tpu.utils import TrackerConfig
    from pf_monocular_pose_estimator_tpu.utils.flags import FailFlag

    camera, markers = default_camera(), demo_markers()
    mask = jnp.ones((markers.shape[0],), bool)
    seq = make_orbit_sequence(camera, markers, num_frames=8, fps=50.0)
    blank = jnp.zeros_like(seq.frames[0])

    def mature(config):
        step = make_tracker(camera, markers, mask, config)
        state = TargetState.create(config.n_particles, jax.random.PRNGKey(0))
        for i in range(4):
            state, res = step(state, seq.frames[i], seq.times[i])
        assert int(state.it_since_initialized) == 2
        return step, state

    config = TrackerConfig(n_particles=512, min_blob_area=8.0, pf_max_retries=3,
                           pf_coast_frames=2)
    step, state = mature(config)
    t0 = float(state.time_current)
    # two blank frames: rejected but coasted — the track survives
    for k in range(2):
        state, res = step(state, blank, t0 + 0.02 * (k + 1))
        assert int(res.fail_flag) == int(FailFlag.PF_NO_REASONABLE_PARTICLE)
        assert not bool(res.pose_updated)
        assert int(state.it_since_initialized) == 2
        assert int(state.coast_frames) == k + 1
    # third consecutive rejection exhausts the budget: full reset
    state, res = step(state, blank, t0 + 0.06)
    assert int(state.it_since_initialized) == 0
    # a good frame after coasting re-acquires without re-init
    step2, state2 = mature(config)
    state2, _ = step2(state2, blank, float(state2.time_current) + 0.02)
    state2, res2 = step2(state2, seq.frames[5], seq.times[5])
    assert bool(res2.pose_updated) and int(state2.coast_frames) == 0

    # reference parity: first rejection resets immediately
    config_p = TrackerConfig.reference_parity(
        n_particles=512, min_blob_area=8.0, pf_max_retries=3)
    step_p, state_p = mature(config_p)
    state_p, res_p = step_p(state_p, blank, float(state_p.time_current) + 0.02)
    assert int(state_p.it_since_initialized) == 0
