"""Behavioural parity: engine vs the reference oracle (tests/oracle).

Round-1 verdict: every accuracy number was produced and graded by the
same code.  These tests feed IDENTICAL inputs to the engine's JAX kernels
and to `tests/oracle/ref_oracle.py` — a scalar float64 transliteration of
the C++ — and require matching outputs:

  * calculateEstimationProbability  <->  pf.weight / pf.soa weighting
  * initialise voting sweep         <->  tracker.init_search histogram
  * correspondencesFromHistogram    <->  engine histogram extraction
  * optimisePose (Gauss-Newton)     <->  pf.refine.gauss_newton_refine
  * P3P::computePoses               <->  solvers.p3p (+ cv2.solveP3P)
  * exponentialMap / logarithmMap   <->  geometry.se3
  * P3P_short recovery              <->  tracker.short_p3p

Where the engine runs float32 and the oracle float64, tolerances cover
only rounding — any semantic drift (matching order, penalties, gates)
produces order-of-magnitude failures.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pf_monocular_pose_estimator_tpu.geometry.camera import Camera, project
from pf_monocular_pose_estimator_tpu.geometry.se3 import exp_se3, log_se3
from pf_monocular_pose_estimator_tpu.ops.blob import Detections
from pf_monocular_pose_estimator_tpu.pf.refine import gauss_newton_refine
from pf_monocular_pose_estimator_tpu.pf.weight import weight_particles
from pf_monocular_pose_estimator_tpu.pf.soa import pack, weight_particles_soa
from pf_monocular_pose_estimator_tpu.solvers import p3p_kneip, p3p_object_to_camera
from pf_monocular_pose_estimator_tpu.tracker.init_search import (
    brute_force_histogram,
    correspondences_from_histogram,
)
from pf_monocular_pose_estimator_tpu.utils.config import TrackerConfig

from oracle import ref_oracle as ref


def _camera():
    return Camera.create(fx=615.0, fy=615.0, cx=376.0, cy=240.0)


def _markers():
    return jnp.asarray(
        [
            [0.06, 0.0, 0.0, 1.0],
            [-0.04, 0.05, 0.0, 1.0],
            [-0.04, -0.05, 0.0, 1.0],
            [0.0, 0.0, 0.07, 1.0],
            [0.03, -0.03, 0.04, 1.0],
        ],
        jnp.float32,
    )


def _pose(tx=0.05, ty=-0.03, tz=1.4, rx=0.2, ry=-0.1, rz=0.15):
    return exp_se3(jnp.asarray([tx, ty, tz - 1.0, rx, ry, rz], jnp.float32)) @ jnp.diag(
        jnp.asarray([1.0, 1.0, 1.0, 1.0], jnp.float32)
    ) + jnp.asarray([[0, 0, 0, 0], [0, 0, 0, 0], [0, 0, 0, 1.0], [0, 0, 0, 0]], jnp.float32) * 0


def _scene(rng, n_particles=48, k_extra=1, noise=0.8):
    """Common scene: true pose, detections = projected markers + jitter +
    spurious extras; a bank of perturbed particle poses."""
    camera = _camera()
    markers = _markers()
    true_pose = np.asarray(
        ref.exponential_map([0.05, -0.03, 0.45, 0.2, -0.1, 0.15]), np.float64
    )
    true_pose[2, 3] += 0.95
    uv = np.asarray(project(camera, jnp.asarray(true_pose, jnp.float32), markers))
    det = uv + rng.normal(0, noise, uv.shape)
    extras = det[rng.integers(0, len(det), k_extra)] + rng.uniform(20, 60, (k_extra, 2))
    det_all = np.concatenate([det, extras], 0).astype(np.float32)
    # particle bank: perturbations of the true pose
    twists = rng.normal(0, 0.02, (n_particles, 6))
    bank = np.stack([ref.exponential_map(t) @ true_pose for t in twists]).astype(
        np.float32
    )
    return camera, markers, true_pose, det_all, bank


# ------------------------------------------------------------- weighting
def test_weight_parity_vs_oracle():
    rng = np.random.default_rng(7)
    camera, markers, true_pose, det_all, bank = _scene(rng)
    k_cap = 8
    det_xy = np.zeros((k_cap, 2), np.float32)
    det_xy[: len(det_all)] = det_all
    det_mask = np.zeros((k_cap,), bool)
    det_mask[: len(det_all)] = True
    m = markers.shape[0]
    marker_mask = jnp.ones((m,), bool)
    downgrade = np.zeros((m,), bool)
    downgrade[2] = True  # exercise the -2 downgrade penalty
    tol_pf, tol_init = 10.0, 5.0

    w_eng, pairs_eng, ncorr_eng = jax.jit(weight_particles, static_argnums=())(
        camera,
        jnp.asarray(bank),
        markers,
        marker_mask,
        jnp.asarray(det_xy),
        jnp.asarray(det_mask),
        tol_pf,
        tol_init,
        jnp.asarray(downgrade),
    )
    w_soa, pairs_soa, ncorr_soa = weight_particles_soa(
        camera,
        pack(jnp.asarray(bank)),
        markers,
        marker_mask,
        jnp.asarray(det_xy),
        jnp.asarray(det_mask),
        tol_pf,
        tol_init,
        jnp.asarray(downgrade),
    )
    np.testing.assert_allclose(np.asarray(w_eng), np.asarray(w_soa), rtol=1e-5, atol=1e-4)

    for n in range(bank.shape[0]):
        uv_n = np.stack(
            [
                ref.project2d(
                    np.asarray(markers[j], np.float64),
                    bank[n].astype(np.float64),
                    615.0,
                    615.0,
                    376.0,
                    240.0,
                )
                for j in range(m)
            ]
        )
        prob, pairs_ref = ref.calculate_estimation_probability(
            det_all.astype(np.float64), uv_n, tol_pf, tol_init, m, downgrade
        )
        assert abs(prob - float(w_eng[n])) < 5e-3, (
            f"particle {n}: oracle {prob} vs engine {float(w_eng[n])}"
        )
        # pairs: engine (M,2) (marker, det) 0-based -1 padded; oracle
        # 1-based (led, det)
        eng_set = {
            (int(p[0]), int(p[1]))
            for p in np.asarray(pairs_eng[n])
            if p[0] >= 0
        }
        ref_set = {(int(a) - 1, int(b) - 1) for a, b in pairs_ref}
        assert eng_set == ref_set
        assert int(ncorr_eng[n]) == len(ref_set)


# ------------------------------------------------------- init histogram
def test_init_histogram_parity_vs_oracle():
    rng = np.random.default_rng(3)
    camera, markers, true_pose, det_all, _ = _scene(rng, k_extra=1, noise=0.3)
    k_cap = 16
    det_xy = np.zeros((k_cap, 2), np.float32)
    det_xy[: len(det_all)] = det_all
    det_mask = np.zeros((k_cap,), bool)
    det_mask[: len(det_all)] = True
    det = Detections(
        xy=jnp.asarray(det_xy),
        xy_distorted=jnp.asarray(det_xy),
        mask=jnp.asarray(det_mask),
        area=jnp.zeros((k_cap,)),
        occluded=jnp.zeros((k_cap,), bool),
        injected=jnp.zeros((k_cap,), bool),
    )
    config = TrackerConfig()
    hist_eng = np.asarray(
        jax.jit(brute_force_histogram, static_argnums=(4,))(
            camera, det, markers, jnp.ones((markers.shape[0],), bool), config
        )
    )[: len(det_all)]

    hist_ref = ref.init_histogram(
        det_all.astype(np.float64),
        np.asarray(markers, np.float64),
        615.0,
        615.0,
        376.0,
        240.0,
        config.back_projection_pixel_tolerance,
        config.init_pair_distance_gate,
        config.init_cluster_radius,
        config.init_cluster_min,
    )

    # f32-vs-f64 P3P can flip votes that sit exactly on the 5 px gate;
    # demand cell-wise closeness (oracle max vote ~35, slack 2).
    assert hist_eng.shape == hist_ref.shape
    denom = max(hist_ref.max(), 1)
    assert np.abs(hist_eng - hist_ref).max() <= max(2, 0.05 * denom), (
        f"engine:\n{hist_eng}\nreference:\n{hist_ref}"
    )

    # identical histogram through both extractors -> identical ranked top
    # candidate (extraction semantics parity, independent of the +-1 vote
    # jitter above, which can flip near-tied candidates on either side)
    det_mask_r = np.zeros((k_cap,), bool)
    det_mask_r[: len(det_all)] = True
    hist_pad = np.zeros((k_cap, markers.shape[0]), np.int64)
    hist_pad[: len(det_all)] = hist_ref
    cand = correspondences_from_histogram(
        jnp.asarray(hist_pad, jnp.int32),
        jnp.asarray(det_mask_r),
        jnp.ones((markers.shape[0],), bool),
        config,
        initialisation=True,
    )
    ref_list = ref.correspondences_from_histogram(hist_ref, b_initialisation=True)
    top_ref = {(int(a) - 1, int(b) - 1) for a, b in ref_list[0]}
    top_eng = {
        (mi, int(di))
        for mi, di in enumerate(np.asarray(cand.det_for_marker[0]))
        if di >= 0
    }
    assert bool(cand.valid[0]) and top_eng == top_ref


def test_full_initialise_parity():
    """Whole init path A/B: engine `initialise` and the oracle's faithful
    `ref.initialise` (histogram -> ranked candidates -> P3P-consensus
    checkCorrespondences) must agree on SUCCESS/FAILURE per scene, and on
    the recovered correspondence + pose when both succeed.

    Scene (seed=3, one spurious blob) is a known shared failure: the
    1.3/(K*M) probability threshold (pose_estimator.cpp:1159-1163) kills
    the true (det3, marker3) cell on both sides, the ranked candidates
    are all wrong, and the validator rightly rejects them — the reference
    would drop this frame too (re-init next frame)."""
    from pf_monocular_pose_estimator_tpu.tracker.initialise import initialise

    for seed, k_extra, expect in [(3, 1, False), (3, 0, True), (5, 0, True)]:
        rng = np.random.default_rng(seed)
        camera, markers, true_pose, det_all, _ = _scene(
            rng, k_extra=k_extra, noise=0.3
        )
        k_cap = 16
        det_xy = np.zeros((k_cap, 2), np.float32)
        det_xy[: len(det_all)] = det_all
        det_mask = np.zeros((k_cap,), bool)
        det_mask[: len(det_all)] = True
        det = Detections(
            xy=jnp.asarray(det_xy),
            xy_distorted=jnp.asarray(det_xy),
            mask=jnp.asarray(det_mask),
            area=jnp.zeros((k_cap,)),
            occluded=jnp.zeros((k_cap,), bool),
            injected=jnp.zeros((k_cap,), bool),
        )
        # engine robustness extensions OFF: this test asserts exact
        # reference behaviour (the default config intentionally BEATS the
        # reference on the spurious-blob scene via drop-one variants)
        config = TrackerConfig.reference_parity(n_particles=64)
        bank = jnp.tile(jnp.eye(4, dtype=jnp.float32).reshape(16, 1), (1, 64))
        res = initialise(
            camera, det, markers, jnp.ones((markers.shape[0],), bool), bank, config
        )
        ok_ref, pose_ref, corr_ref, _ = ref.initialise(
            det_all.astype(np.float64),
            np.asarray(markers, np.float64),
            615.0,
            615.0,
            376.0,
            240.0,
            config.back_projection_pixel_tolerance,
        )
        assert bool(res.success) == ok_ref == expect, (
            f"seed={seed} extra={k_extra}: engine={bool(res.success)} "
            f"oracle={ok_ref} expected={expect}"
        )
        if ok_ref:
            t_err = np.linalg.norm(np.asarray(res.pose)[:3, 3] - pose_ref[:3, 3])
            assert t_err < 1e-3, f"init pose disagreement {t_err} m"
            dfm = np.asarray(res.det_for_marker)
            ref_map = {int(a) - 1: int(b) - 1 for a, b in corr_ref}
            assert all(
                dfm[i] == ref_map.get(i, -1) for i in range(markers.shape[0])
            ), (dfm, ref_map)
            t_true = np.linalg.norm(pose_ref[:3, 3] - true_pose[:3, 3])
            # pre-GN init pose (Umeyama of the mean P3P cloud) is coarse
            assert t_true < 0.02, f"oracle init off ground truth by {t_true}"


def test_correspondence_extraction_parity():
    config = TrackerConfig()
    hists = [
        np.diag([40, 37, 29, 22, 18]),  # clean diagonal
        np.array(  # off-diagonal best + competition + an empty LED column
            [
                [2, 30, 0, 0, 0],
                [25, 4, 0, 0, 0],
                [0, 0, 28, 0, 3],
                [0, 3, 0, 24, 0],
                [1, 0, 2, 0, 0],
            ]
        ),
        np.array(  # ambiguity: detection 0 strong for LEDs 0 and 1
            [
                [30, 28, 0, 0, 0],
                [0, 25, 0, 0, 0],
                [0, 0, 22, 0, 0],
                [0, 0, 0, 20, 0],
                [0, 0, 0, 0, 18],
            ]
        ),
    ]
    for hist in hists:
        k, m = hist.shape
        cand = correspondences_from_histogram(
            jnp.asarray(hist, jnp.int32),
            jnp.ones((k,), bool),
            jnp.ones((m,), bool),
            config,
            initialisation=True,
        )
        ref_list = ref.correspondences_from_histogram(hist, b_initialisation=True)
        if not ref_list:
            # reference drops every (ambiguous) candidate -> engine must too
            assert not bool(cand.valid[0]), f"hist=\n{hist}: engine kept a candidate"
            continue
        # compare the top-ranked full correspondence
        top_ref = {(int(a) - 1, int(b) - 1) for a, b in ref_list[0]}
        top_eng = {
            (mi, int(di))
            for mi, di in enumerate(np.asarray(cand.det_for_marker[0]))
            if di >= 0
        }
        assert bool(cand.valid[0])
        assert top_eng == top_ref, f"hist=\n{hist}\neng={top_eng}\nref={top_ref}"


# --------------------------------------------------------- Gauss-Newton
def test_gauss_newton_parity_vs_oracle():
    rng = np.random.default_rng(11)
    camera, markers, true_pose, det_all, _ = _scene(rng, k_extra=0, noise=0.5)
    m = markers.shape[0]
    pose0 = ref.exponential_map(rng.normal(0, 0.02, 6)) @ true_pose

    corr_eng = jnp.asarray([[i, i] for i in range(m)], jnp.int32)
    res = gauss_newton_refine(
        camera,
        jnp.asarray(pose0, jnp.float32),
        markers,
        jnp.asarray(det_all[:m], jnp.float32),
        corr_eng,
        jnp.ones((m,), bool),
        max_iterations=50,
        convergence_tol=1e-6,
    )
    corr_ref = np.asarray([[i + 1, i + 1] for i in range(m)])
    pose_ref, cov_ref, n_iter = ref.optimise_pose(
        pose0,
        corr_ref,
        det_all[:m].astype(np.float64),
        np.asarray(markers, np.float64),
        615.0,
        615.0,
        376.0,
        240.0,
    )
    t_err = np.linalg.norm(np.asarray(res.pose)[:3, 3] - pose_ref[:3, 3])
    r_err = np.linalg.norm(
        ref.logarithm_map(np.linalg.inv(pose_ref) @ np.asarray(res.pose, np.float64))[3:]
    )
    assert t_err < 1e-3, f"translation drift {t_err}"
    assert r_err < 2e-3, f"rotation drift {r_err}"
    # covariance: same normal-equations inverse, up to f32 rounding
    np.testing.assert_allclose(
        np.asarray(res.covariance), cov_ref, rtol=0.05, atol=1e-9
    )


# ------------------------------------------------------------------ P3P
def test_p3p_parity_vs_oracle_and_opencv():
    rng = np.random.default_rng(5)
    camera, markers, true_pose, det_all, _ = _scene(rng, k_extra=0, noise=0.0)
    m3 = np.asarray(markers[:3, :3], np.float64)
    uv3 = det_all[:3].astype(np.float64)
    bearings = ref.calculate_image_vectors(uv3, 615.0, 615.0, 376.0, 240.0)

    sols_ref, ok = ref.p3p_compute_poses(bearings.T, m3.T)  # Eigen columns
    assert ok
    fv = jnp.asarray(bearings, jnp.float32)[None]  # engine: rows
    wp = jnp.asarray(m3, jnp.float32)[None]
    sols_eng, valid = p3p_kneip(fv, wp)
    assert bool(valid[0])
    sols_eng = np.asarray(sols_eng[0])  # (4,4,4)

    for k in range(4):
        if not np.all(np.isfinite(sols_ref[k])):
            continue
        diffs = [
            np.abs(sols_eng[j][:3, :] - sols_ref[k]).max() for j in range(4)
        ]
        assert min(diffs) < 5e-3, f"oracle solution {k} missing from engine: {diffs}"

    # one of the object->camera solutions must be the true pose
    t_oc = np.asarray(p3p_object_to_camera(jnp.asarray(sols_eng)[None]))[0]
    best = min(
        np.abs(t_oc[k] - true_pose).max() for k in range(4) if np.isfinite(t_oc[k]).all()
    )
    assert best < 1e-2

    # independent cross-check: OpenCV's P3P on the same triple
    cv2 = pytest.importorskip("cv2")
    k_mat = np.array([[615.0, 0, 376.0], [0, 615.0, 240.0], [0, 0, 1]])
    n_sol, rvecs, tvecs = cv2.solveP3P(
        m3.reshape(-1, 1, 3),
        uv3.reshape(-1, 1, 2),
        k_mat,
        np.zeros(5),
        flags=cv2.SOLVEPNP_P3P,
    )
    assert n_sol > 0
    found_true = False
    for r, t in zip(rvecs, tvecs):
        r_mat, _ = cv2.Rodrigues(r)
        t_cv = np.eye(4)
        t_cv[:3, :3] = r_mat
        t_cv[:3, 3] = t.ravel()
        if np.abs(t_cv - true_pose).max() < 1e-2:
            found_true = True
    assert found_true, "OpenCV P3P disagrees with the scene construction"


# ------------------------------------------------------------ SE(3) maps
def test_se3_maps_parity_vs_oracle():
    rng = np.random.default_rng(13)
    for _ in range(20):
        twist = rng.normal(0, 0.5, 6)
        t_ref = ref.exponential_map(twist)
        t_eng = np.asarray(exp_se3(jnp.asarray(twist, jnp.float32)), np.float64)
        assert np.abs(t_ref - t_eng).max() < 1e-5
        back = np.asarray(log_se3(jnp.asarray(t_ref, jnp.float32)), np.float64)
        assert np.abs(back - ref.logarithm_map(t_ref)).max() < 1e-4


# ----------------------------------------------------------- short-P3P
def test_short_p3p_parity_vs_oracle():
    """P3P_short (pose_estimator.cpp:2506-2741) vs tracker.short_p3p:
    same 3 surviving pairs, same detections -> both recover, the same
    marker->detection binding wins, and the poses agree to f32 noise.

    The oracle is faithful to the reference's third-point loops running
    one short of the available lists (:2560-2561); the engine enumerates
    all candidates.  On a clean scene every vote targets the true
    binding, so the ranked winner is identical either way.
    """
    from pf_monocular_pose_estimator_tpu.ops.blob import Detections
    from pf_monocular_pose_estimator_tpu.tracker.short_p3p import short_p3p
    from pf_monocular_pose_estimator_tpu.pf.soa import identity_bank16

    rng = np.random.default_rng(11)
    camera, markers, true_pose, det_all, _ = _scene(rng, k_extra=1, noise=0.3)
    m = markers.shape[0]
    k_cap = 8
    k_real = len(det_all)  # 5 markers + 1 spurious
    det_xy = np.zeros((k_cap, 2), np.float32)
    det_xy[:k_real] = det_all
    det_mask = np.zeros((k_cap,), bool)
    det_mask[:k_real] = True
    tol = 5.0

    # 3 surviving (marker, detection) pairs: markers 0,1,2 <-> dets 0,1,2
    given0 = np.asarray([[0, 0], [1, 1], [2, 2]], np.int64)  # 0-based

    # --- oracle (1-based [led, det]) ---
    found_o, pose_o, corr_o, seeds_o, hist_o = ref.p3p_short(
        given0 + 1,
        [det_all[i] for i in range(k_real)],
        [np.asarray(markers[j], np.float64) for j in range(m)],
        camera.fx, camera.fy, camera.cx, camera.cy,
        back_projection_pixel_tolerance=tol,
        min_num_leds_detected=4,
    )
    assert found_o
    # oracle's winning binding, as det-for-marker
    dfm_o = -np.ones((m,), np.int64)
    for led, d in np.asarray(corr_o).reshape(-1, 2):
        dfm_o[led - 1] = d - 1

    # --- engine ---
    det = Detections(
        xy=jnp.asarray(det_xy),
        xy_distorted=jnp.asarray(det_xy),
        mask=jnp.asarray(det_mask),
        area=jnp.where(jnp.asarray(det_mask), 30.0, 0.0),
        occluded=jnp.zeros((k_cap,), bool),
        injected=jnp.zeros((k_cap,), bool),
    )
    config = TrackerConfig(
        n_particles=64,
        back_projection_pixel_tolerance=tol,
    )
    res = short_p3p(
        _camera(), det, markers, jnp.ones((m,), bool),
        jnp.asarray(given0, jnp.int32), identity_bank16(64), config,
    )
    assert bool(res.success)
    np.testing.assert_array_equal(np.asarray(res.det_for_marker), dfm_o)
    # pose parity: f32 engine vs f64 oracle on the same validated binding
    np.testing.assert_allclose(
        np.asarray(res.pose)[:3, 3], pose_o[:3, 3], atol=2e-3
    )
    np.testing.assert_allclose(
        np.asarray(res.pose)[:3, :3], pose_o[:3, :3], atol=5e-3
    )
    # the refilled bank carries validated P3P seeds (lane 0 untouched)
    assert bool(jnp.any(res.bank[:, 1:] != identity_bank16(64)[:, 1:]))

    # --- negative case: too few detections -> both decline ---
    det_few = det._replace(mask=jnp.asarray([True, True, True] + [False] * 5))
    found_f, *_ = ref.p3p_short(
        given0 + 1, [det_all[i] for i in range(3)],
        [np.asarray(markers[j], np.float64) for j in range(m)],
        camera.fx, camera.fy, camera.cx, camera.cy,
        back_projection_pixel_tolerance=tol, min_num_leds_detected=4,
    )
    res_f = short_p3p(
        _camera(), det_few, markers, jnp.ones((m,), bool),
        jnp.asarray(given0, jnp.int32), identity_bank16(64), config,
    )
    assert not found_f and not bool(res_f.success)
