"""Correspondence validation by exhaustive sub-triple P3P consensus.

Functional parity target: PoseEstimator::checkCorrespondences
(pf_mpe_lib/src/pose_estimator.cpp:1312-1501):
  * for every 3-combination of the given correspondences, run P3P;
  * for each of the 4 candidate poses, back-project the *unused*
    correspondences and score certainty = matched / unused within
    `back_projection_pixel_tolerance_` (calculateSquaredReprojectionError
    AndCertainty, :1087-1132 — index-aligned pairs, so the greedy
    min-pick loop reduces to a sorted-prefix count);
  * a combination is valid if any pose passes `certainty_threshold_`;
    its best pose seeds the particle bank (:1429-1437);
  * success iff valid/total >= `valid_correspondence_threshold_`; the
    output pose is the Umeyama fit of the markers to the mean
    back-projected cloud (:1480-1488).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ..geometry.align import umeyama_rigid
from ..geometry.camera import Camera, bearing_vectors, project
from ..solvers import combination_table, p3p_kneip, p3p_object_to_camera
from ..utils.config import TrackerConfig
from ..utils.dynamic import DynamicParams
from ..utils.flags import FailFlag


class CheckResult(NamedTuple):
    success: jnp.ndarray  # bool
    pose: jnp.ndarray  # (4,4) Umeyama consensus pose (object->camera)
    seeds: jnp.ndarray  # (S,4,4) valid best-per-combo P3P poses
    seed_mask: jnp.ndarray  # (S,)
    num_valid: jnp.ndarray  # int32
    flag: jnp.ndarray  # int32 FailFlag


def check_correspondences(
    camera: Camera,
    det_xy: jnp.ndarray,
    det_mask: jnp.ndarray,
    markers_h: jnp.ndarray,
    marker_mask: jnp.ndarray,
    det_for_marker: jnp.ndarray,
    min_needed: jnp.ndarray,
    config: TrackerConfig,
    dyn: DynamicParams | None = None,
) -> CheckResult:
    """Validate one correspondence hypothesis.

    det_for_marker: (M,) detection index per marker, -1 where unassigned.
    min_needed: traced scalar — required pair count (all markers for PF
    init, `min_num_leds_detected` for IPE/short-P3P, :1737-1740).
    dyn: traced runtime-tunable parameters; defaults to the config values
    (compile-time constants).
    """
    if dyn is None:
        dyn = DynamicParams.from_config(config)
    m_cap = markers_h.shape[0]
    dtype = det_xy.dtype
    tol = dyn.back_projection_pixel_tolerance.astype(dtype)
    tol2 = tol * tol

    safe_det = jnp.clip(det_for_marker, 0, det_xy.shape[0] - 1)
    pair_ok = (det_for_marker >= 0) & marker_mask & det_mask[safe_det]  # (M,)
    n_corr = jnp.sum(pair_ok.astype(jnp.int32))
    enough = n_corr >= min_needed

    pair_xy = det_xy[safe_det]  # (M,2)
    bearings = bearing_vectors(camera, pair_xy)  # (M,3)

    combos = jnp.asarray(combination_table(m_cap, 3))  # (C,3) slot indices
    n_c = combos.shape[0]
    combo_ok = pair_ok[combos].all(axis=-1)  # (C,)

    fv = bearings[combos]  # (C,3,3)
    wp = markers_h[combos][..., :3]  # (C,3,3)
    sols, p3p_ok = p3p_kneip(fv, wp)
    t_oc = p3p_object_to_camera(sols)  # (C,4,4,4)
    finite = jnp.isfinite(t_oc).all(axis=(-1, -2))  # (C,4)

    # unused slots per combo: valid pairs not among the 3 chosen
    slot_in_combo = (jnp.arange(m_cap)[None, :, None] == combos[:, None, :]).any(-1)  # (C,M)
    unused = pair_ok[None, :] & ~slot_in_combo  # (C,M)
    n_unused = jnp.maximum(jnp.sum(unused.astype(jnp.int32), -1), 1)  # (C,)

    uv = project(camera, t_oc, markers_h)  # (C,4,M,2)
    d2 = jnp.sum((pair_xy[None, None, :, :] - uv) ** 2, -1)  # (C,4,M)
    matched = (d2 <= tol2) & unused[:, None, :]  # (C,4,M)
    n_matched = jnp.sum(matched.astype(jnp.int32), -1)  # (C,4)
    certainty = n_matched.astype(dtype) / n_unused[:, None].astype(dtype)
    err = jnp.sum(jnp.where(matched, d2, 0.0), -1)  # (C,4)

    sol_valid = (
        combo_ok[:, None]
        & p3p_ok[:, None]
        & finite
        & (certainty >= dyn.certainty_threshold.astype(dtype))
    )  # (C,4)
    combo_valid = sol_valid.any(-1)  # (C,)
    best = jnp.argmin(jnp.where(sol_valid, err, jnp.asarray(jnp.inf, dtype)), axis=-1)  # (C,)
    best_pose = jnp.take_along_axis(t_oc, best[:, None, None, None], axis=1)[:, 0]  # (C,4,4)

    # mean back-projected marker cloud over valid combos (:1444-1448)
    cam_pts = jnp.einsum("cij,mj->cmi", best_pose[:, :3, :], markers_h)  # (C,M,3)
    n_valid = jnp.sum(combo_valid.astype(jnp.int32))
    cloud = jnp.sum(
        jnp.where(combo_valid[:, None, None], cam_pts, 0.0), axis=0
    ) / jnp.maximum(n_valid, 1).astype(dtype)
    consensus = umeyama_rigid(
        jnp.broadcast_to(markers_h[:, :3], cloud.shape), cloud, marker_mask.astype(dtype)
    )

    n_total = jnp.maximum(jnp.sum(combo_ok.astype(jnp.int32)), 1)
    fraction_ok = (
        n_valid.astype(dtype) / n_total.astype(dtype)
        >= dyn.valid_correspondence_threshold.astype(dtype)
    )
    success = enough & (n_valid > 0) & fraction_ok

    flag = jnp.where(
        ~enough,
        FailFlag.TOO_FEW_CORRESPONDENCES,
        jnp.where(
            success,
            FailFlag.INIT_SUCCESS,
            jnp.where(n_valid > 0, FailFlag.NOT_ENOUGH_VALID_CORR, FailFlag.CERTAINTY_FAILED_ALL),
        ),
    ).astype(jnp.int32)

    return CheckResult(
        success=success,
        pose=consensus,
        seeds=best_pose,
        seed_mask=combo_valid & enough,
        num_valid=n_valid,
        flag=flag,
    )
