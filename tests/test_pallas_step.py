"""Equivalence of the fused propagate+weight Pallas kernel
(pf/pallas_step.py, interpret mode) against the XLA pipeline
`propagate_soa` + `weight_particles_soa` — same keys, same draws."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pf_monocular_pose_estimator_tpu.io.synthetic import default_camera
from pf_monocular_pose_estimator_tpu.pf.propagate import NoiseBounds
from pf_monocular_pose_estimator_tpu.pf.soa import (
    propagate_soa,
    weight_particles_soa,
)
from pf_monocular_pose_estimator_tpu.pf.pallas_step import (
    fused_propagate_weight_pallas,
)

CAM = default_camera()
NOISE = NoiseBounds(
    min_translation=-0.01,
    max_translation=0.01,
    min_angular=-0.02,
    max_angular=0.02,
)


def _random_pose(key, scale=0.3):
    ka, kt = jax.random.split(key)
    w = jax.random.normal(ka, (3,)) * 0.4
    th = jnp.linalg.norm(w) + 1e-9
    ax = w / th
    K = jnp.array(
        [[0, -ax[2], ax[1]], [ax[2], 0, -ax[0]], [-ax[1], ax[0], 0]]
    )
    R = jnp.eye(3) + jnp.sin(th) * K + (1 - jnp.cos(th)) * (K @ K)
    t = jax.random.normal(kt, (3,)) * scale + jnp.array([0.0, 0.0, 1.2])
    return (
        jnp.eye(4).at[:3, :3].set(R).at[:3, 3].set(t).astype(jnp.float32)
    )


def _setup(seed, n, tracking, apply_pred):
    key = jax.random.PRNGKey(seed)
    ks = jax.random.split(key, 8)
    markers = jnp.concatenate(
        [jax.random.normal(ks[0], (5, 3)) * 0.08, jnp.ones((5, 1))], axis=1
    ).astype(jnp.float32)
    marker_mask = jnp.array([True, True, True, True, False])
    gt = _random_pose(ks[1])
    # detections near the truth
    pts = (gt @ markers.T)[:3]
    uv = jnp.stack(
        [
            CAM.fx * pts[0] / pts[2] + CAM.cx,
            CAM.fy * pts[1] / pts[2] + CAM.cy,
        ],
        axis=1,
    )
    det_xy = jnp.zeros((16, 2), jnp.float32).at[:5].set(uv)
    det_mask = jnp.zeros((16,), bool).at[:4].set(True)

    bank = jax.vmap(lambda k: _random_pose(k, 0.05))(
        jax.random.split(ks[2], n)
    )
    bank16 = bank.reshape(n, 16).T
    cur = _random_pose(ks[3])
    pred = _random_pose(ks[4])
    predm = _random_pose(ks[5], 0.01)
    cmi = _random_pose(ks[6], 0.01)
    downgrade = jnp.array([False, True, False, False, False])
    return dict(
        key=ks[7],
        bank16=bank16,
        cur=cur,
        pred=pred,
        predm=predm,
        cmi=cmi,
        markers=markers,
        marker_mask=marker_mask,
        det_xy=det_xy,
        det_mask=det_mask,
        downgrade=downgrade,
        tracking=jnp.asarray(tracking),
        apply_pred=jnp.asarray(apply_pred),
    )


@pytest.mark.parametrize(
    "tracking,apply_pred", [(True, True), (True, False), (False, False)]
)
@pytest.mark.parametrize("seed,n", [(0, 512), (3, 1024)])
def test_fused_matches_xla_pipeline(seed, n, tracking, apply_pred):
    s = _setup(seed, n, tracking, apply_pred)
    # (3,) per-axis factors, as propagation_noise_factors returns
    fac_t = jnp.float32(1.3) * jnp.ones((3,), jnp.float32)
    fac_r = jnp.float32(0.9) * jnp.ones((3,), jnp.float32)
    infl = jnp.float32(1.1)
    tol_pf = jnp.float32(18.0)
    tol_init = jnp.float32(6.0)

    ref_bank = propagate_soa(
        s["key"], s["bank16"], s["cur"], s["pred"], s["predm"], s["cmi"],
        NOISE, fac_t, fac_r, s["tracking"], s["apply_pred"], infl,
    )
    ref_w, ref_pairs, ref_nc = weight_particles_soa(
        CAM, ref_bank, s["markers"], s["marker_mask"], s["det_xy"],
        s["det_mask"], tol_pf, tol_init, s["downgrade"],
    )

    bank, w, pairs, nc = fused_propagate_weight_pallas(
        s["key"], s["bank16"], s["cur"], s["pred"], s["predm"], s["cmi"],
        NOISE, fac_t, fac_r, s["tracking"], s["apply_pred"], infl,
        CAM, s["markers"], s["marker_mask"], s["det_xy"], s["det_mask"],
        tol_pf, tol_init, s["downgrade"],
        block=256, interpret=True,
    )

    # banks: identical draws => identical propagation (allow -0.0 flips
    # and last-ulp trig differences)
    np.testing.assert_allclose(
        np.asarray(bank), np.asarray(ref_bank), rtol=0, atol=1e-6
    )
    # pinned candidate lanes are exact
    np.testing.assert_array_equal(
        np.asarray(bank[:, :2]), np.asarray(ref_bank[:, :2])
    )
    np.testing.assert_allclose(
        np.asarray(w), np.asarray(ref_w), rtol=1e-5, atol=1e-4
    )
    match = (np.asarray(pairs) == np.asarray(ref_pairs)).all(axis=(0, 1))
    assert match.mean() > 0.999
    assert (np.asarray(nc) == np.asarray(ref_nc)).mean() > 0.999


def test_fused_weight_consistent_with_pallas_weight():
    """Feeding the fused kernel's own propagated bank through the
    standalone weight must reproduce the fused weights exactly."""
    from pf_monocular_pose_estimator_tpu.pf.pallas_weight import (
        weight_particles_pallas,
    )

    s = _setup(11, 512, True, True)
    tol_pf = jnp.float32(18.0)
    tol_init = jnp.float32(6.0)
    bank, w, pairs, nc = fused_propagate_weight_pallas(
        s["key"], s["bank16"], s["cur"], s["pred"], s["predm"], s["cmi"],
        NOISE, jnp.float32(1.0), jnp.float32(1.0), s["tracking"],
        s["apply_pred"], jnp.float32(1.0),
        CAM, s["markers"], s["marker_mask"], s["det_xy"], s["det_mask"],
        tol_pf, tol_init, s["downgrade"],
        block=256, interpret=True,
    )
    w2, pairs2, nc2 = weight_particles_pallas(
        CAM, bank, s["markers"], s["marker_mask"], s["det_xy"],
        s["det_mask"], tol_pf, tol_init, s["downgrade"],
        block=256, interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(w), np.asarray(w2))
    np.testing.assert_array_equal(np.asarray(pairs), np.asarray(pairs2))
    np.testing.assert_array_equal(np.asarray(nc), np.asarray(nc2))


@pytest.mark.parametrize(
    "tracking,apply_pred", [(True, True), (False, False)]
)
@pytest.mark.parametrize("seed,n", [(0, 2048), (5, 4096), (7, 2560)])
def test_folded_kernel_bit_identical(seed, n, tracking, apply_pred):
    """The sublane-folded fused kernel computes per-element expressions
    in the same order as the straight kernel — outputs are bit-identical
    (interpret mode; on TPU the packing differs but the math does not)."""
    s = _setup(seed, n, tracking, apply_pred)
    fac_t = jnp.float32(1.3) * jnp.ones((3,), jnp.float32)
    fac_r = jnp.float32(0.9) * jnp.ones((3,), jnp.float32)
    infl = jnp.float32(1.1)
    tol_pf = jnp.float32(18.0)
    tol_init = jnp.float32(6.0)

    args = (
        s["key"], s["bank16"], s["cur"], s["pred"], s["predm"], s["cmi"],
        NOISE, fac_t, fac_r, s["tracking"], s["apply_pred"], infl,
        CAM, s["markers"], s["marker_mask"], s["det_xy"], s["det_mask"],
        tol_pf, tol_init, s["downgrade"],
    )
    bank_s, w_s = fused_propagate_weight_pallas(
        *args, block=1024, interpret=True, want_pairs=False
    )
    bank_f, w_f = fused_propagate_weight_pallas(
        *args, block=1024, interpret=True, want_pairs=False, folded=True
    )
    np.testing.assert_array_equal(np.asarray(bank_f), np.asarray(bank_s))
    np.testing.assert_array_equal(np.asarray(w_f), np.asarray(w_s))


def test_bank_top_restore_pin_roundtrip():
    """The 12-row pin chain (bank_top_pin -> gather -> bank_restore_pin,
    tracker/step.py resample path) equals the full-bank gather, given the
    bank bottom-row invariant (flat16 rows 12-15 == (0,0,0,1))."""
    from pf_monocular_pose_estimator_tpu.pf.soa import gather_soa
    from pf_monocular_pose_estimator_tpu.pf.pallas_step import (
        bank_restore_pin,
        bank_top_pin,
    )

    n = 1024
    keys = jax.random.split(jax.random.PRNGKey(3), n)
    bank16 = jnp.stack([_random_pose(k).reshape(16) for k in keys[:8]], axis=1)
    bank16 = jnp.tile(bank16, (1, n // 8))
    anc = jax.random.randint(jax.random.PRNGKey(9), (n,), 0, n, jnp.int32)
    anc = jnp.sort(anc)

    want = gather_soa(bank16, anc)
    # restore of the un-gathered top rows reproduces the bank
    got = bank_restore_pin(bank_top_pin(bank16, interpret=True), interpret=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(bank16))
    got2 = bank_restore_pin(
        gather_soa(bank_top_pin(bank16, interpret=True), anc), interpret=True
    )
    np.testing.assert_array_equal(np.asarray(got2), np.asarray(want))


def test_tracker_bank_bottom_row_invariant():
    """Every pose lane in the tracker's banks keeps the exact rigid
    bottom row — the invariant the 12-row resample pin chain relies on."""
    from pf_monocular_pose_estimator_tpu.io.synthetic import (
        demo_markers,
        make_orbit_sequence,
    )
    from pf_monocular_pose_estimator_tpu.tracker import TargetState, make_tracker
    from pf_monocular_pose_estimator_tpu.utils import TrackerConfig

    markers = demo_markers()
    mask = jnp.ones((markers.shape[0],), bool)
    config = TrackerConfig(n_particles=512, min_blob_area=8.0, pf_max_retries=4)
    seq = make_orbit_sequence(CAM, markers, num_frames=6, fps=50.0)
    step = make_tracker(CAM, markers, mask, config)
    state = TargetState.create(config.n_particles, jax.random.PRNGKey(0))
    const = np.tile(np.array([0.0, 0.0, 0.0, 1.0], np.float32)[:, None], (1, 512))
    for i in range(6):
        state, _ = step(state, seq.frames[i], seq.times[i])
        np.testing.assert_array_equal(np.asarray(state.bank[12:]), const)
        np.testing.assert_array_equal(np.asarray(state.resampled[12:]), const)
