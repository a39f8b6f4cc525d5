"""Short-P3P recovery: partial re-initialisation from 3 surviving pairs.

Functional parity target: PoseEstimator::P3P_short
(pf_mpe_lib/src/pose_estimator.cpp:2506-2741): when the PF weight is
marginal but exactly 3 correspondences survive, fix 2 of them, enumerate
the 3rd point over remaining detections x markers, vote as in `initialise`
but cheaper, validate via checkCorrespondences with the IPE minimum, and
keep the old particle bank when nothing validates (:2698, 2725-2726).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..geometry.camera import Camera, bearing_vectors, project
from ..ops.blob import Detections
from ..solvers import p3p_kneip, p3p_object_to_camera
from ..utils.config import TrackerConfig
from ..utils.dynamic import DynamicParams
from ..utils.flags import FailFlag
from .check import check_correspondences
from .init_search import correspondences_from_histogram
from .initialise import _fill_bank_with_seeds


class ShortP3PResult(NamedTuple):
    success: jnp.ndarray
    pose: jnp.ndarray  # (4,4)
    det_for_marker: jnp.ndarray  # (M,)
    bank: jnp.ndarray  # (16,N) SoA
    flag: jnp.ndarray


def short_p3p(
    camera: Camera,
    det: Detections,
    markers_h: jnp.ndarray,
    marker_mask: jnp.ndarray,
    given_pairs: jnp.ndarray,  # (3,2) int32 (marker_idx, det_idx)
    bank: jnp.ndarray,
    config: TrackerConfig,
    dyn: DynamicParams | None = None,
) -> ShortP3PResult:
    if dyn is None:
        dyn = DynamicParams.from_config(config)
    k_cap = det.xy.shape[0]
    m_cap = markers_h.shape[0]
    dtype = det.xy.dtype
    tol = dyn.back_projection_pixel_tolerance.astype(dtype)

    enough = det.count >= config.min_num_leds_detected

    bearings = bearing_vectors(camera, det.xy)

    # 3 ways to keep 2 of the 3 given pairs (:2524-2526)
    keep_idx = jnp.asarray([[0, 1], [0, 2], [1, 2]], jnp.int32)  # (3,2)

    def one_keep(keep):
        kept = given_pairs[keep]  # (2,2) (marker, det)
        kept_m = kept[:, 0]
        kept_d = kept[:, 1]

        # enumerate 3rd point over all (detection, marker) pairs
        d_idx = jnp.repeat(jnp.arange(k_cap), m_cap)  # (G,)
        m_idx = jnp.tile(jnp.arange(m_cap), k_cap)
        g_ok = (
            det.mask[d_idx]
            & marker_mask[m_idx]
            & (d_idx != kept_d[0])
            & (d_idx != kept_d[1])
            & (m_idx != kept_m[0])
            & (m_idx != kept_m[1])
        )  # (G,)

        fv = jnp.stack(
            [
                jnp.broadcast_to(bearings[kept_d[0]], (d_idx.shape[0], 3)),
                jnp.broadcast_to(bearings[kept_d[1]], (d_idx.shape[0], 3)),
                bearings[d_idx],
            ],
            axis=1,
        )  # (G,3,3)
        wp = jnp.stack(
            [
                jnp.broadcast_to(markers_h[kept_m[0], :3], (m_idx.shape[0], 3)),
                jnp.broadcast_to(markers_h[kept_m[1], :3], (m_idx.shape[0], 3)),
                markers_h[m_idx, :3],
            ],
            axis=1,
        )

        sols, p3p_ok = p3p_kneip(fv, wp)
        t_oc = p3p_object_to_camera(sols)  # (G,4,4,4)
        diff = jnp.max(jnp.abs(sols[:, 1:] - sols[:, :-1]), axis=(-1, -2))
        not_dup = jnp.concatenate([jnp.ones((sols.shape[0], 1), bool), diff > 0], axis=1)
        finite = jnp.isfinite(t_oc).all(axis=(-1, -2))
        sol_ok = g_ok[:, None] & p3p_ok[:, None] & not_dup & finite  # (G,4)

        uv = project(camera, t_oc, markers_h)  # (G,4,M,2)
        dist2 = jnp.sum((det.xy[None, None, :, None, :] - uv[:, :, None, :, :]) ** 2, -1)

        # unused detections / markers for this (keep, third) choice
        row_ok = (
            det.mask[None, :]
            & (jnp.arange(k_cap)[None, :] != kept_d[0])
            & (jnp.arange(k_cap)[None, :] != kept_d[1])
            & (jnp.arange(k_cap)[None, :] != d_idx[:, None])
        )  # (G,K)
        col_ok = (
            marker_mask[None, :]
            & (jnp.arange(m_cap)[None, :] != kept_m[0])
            & (jnp.arange(m_cap)[None, :] != kept_m[1])
            & (jnp.arange(m_cap)[None, :] != m_idx[:, None])
        )  # (G,M)

        big = jnp.asarray(1e12, dtype)
        dist2 = jnp.where(col_ok[:, None, None, :], dist2, big)
        nearest = jnp.argmin(dist2, axis=-1)  # (G,4,K)
        min_d2 = jnp.min(dist2, axis=-1)
        within = (min_d2 <= tol * tol) & row_ok[:, None, :] & sol_ok[..., None]
        any_within = within.any(axis=-1)  # (G,4)

        nn_votes = (
            (jnp.arange(m_cap)[None, None, None, :] == nearest[..., None]) & within[..., None]
        )
        # the 3 *given* pairs get the base votes (:2654-2659)
        given_onehot = jnp.zeros((k_cap, m_cap), jnp.int32)
        for t in range(3):
            given_onehot = given_onehot.at[given_pairs[t, 1], given_pairs[t, 0]].add(1)
        given_votes = given_onehot[None, None] * any_within[..., None, None].astype(jnp.int32)

        return jnp.sum(nn_votes.astype(jnp.int32) + given_votes, axis=(0, 1))

    hist = jnp.sum(jax.vmap(one_keep)(keep_idx), axis=0)  # (K,M)
    hist_nonzero = jnp.any(hist > 0)

    cands = correspondences_from_histogram(
        hist, det.mask, marker_mask, config, initialisation=False
    )

    min_needed = jnp.asarray(config.min_num_leds_detected, jnp.int32)

    def check_one(det_for_marker):
        return check_correspondences(
            camera, det.xy, det.mask, markers_h, marker_mask, det_for_marker, min_needed, config, dyn
        )

    results = jax.vmap(check_one)(cands.det_for_marker)
    cand_success = results.success & cands.valid
    any_success = jnp.any(cand_success)
    first = jnp.argmax(cand_success)

    # seeds only from candidates up to the first validated one (the
    # reference stops walking there, :2698-2726)
    walked = jnp.arange(cands.det_for_marker.shape[0]) <= first
    seeds = results.seeds.reshape(-1, 4, 4)
    seed_mask = (results.seed_mask & (cands.valid & walked)[:, None]).reshape(-1)
    order = jnp.argsort(~seed_mask)
    seeds = seeds[order][: config.max_p3p_seeds]
    seed_mask = seed_mask[order][: config.max_p3p_seeds]
    # keep the old bank when nothing validates (:2725-2726)
    new_bank = jax.lax.cond(
        any_success, lambda: _fill_bank_with_seeds(bank, seeds, seed_mask), lambda: bank
    )

    flag = jnp.where(
        ~enough,
        FailFlag.SHORT_TOO_FEW_DETECTIONS,
        jnp.where(
            ~hist_nonzero,
            FailFlag.SHORT_HISTOGRAM_FAILED,
            jnp.where(
                ~jnp.any(cands.valid),
                FailFlag.SHORT_NO_CORR_FROM_HISTOGRAM,
                jnp.where(any_success, FailFlag.SHORT_P3P_SUCCESS, results.flag[0]),
            ),
        ),
    ).astype(jnp.int32)

    success = enough & hist_nonzero & any_success
    return ShortP3PResult(
        success=success,
        pose=jnp.where(success, results.pose[first], jnp.eye(4, dtype=dtype)),
        det_for_marker=jnp.where(success, cands.det_for_marker[first], -1),
        bank=new_bank,
        flag=flag,
    )
