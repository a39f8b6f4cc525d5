"""Initialisation driver: histogram -> ranked hypotheses -> validation.

Functional parity target: PoseEstimator::initialise
(pf_mpe_lib/src/pose_estimator.cpp:1503-1786): vote histogram, candidate
extraction, per-candidate checkCorrespondences, P3P seed harvesting into
the particle bank (:1742-1760 — remaining bank slots are filled by cycling
the harvested seeds), and the first validated candidate's pose /
correspondences handed to the Gauss-Newton refiner.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..geometry.camera import Camera
from ..ops.blob import Detections
from ..utils.config import TrackerConfig
from ..utils.dynamic import DynamicParams
from ..utils.flags import FailFlag
from .check import check_correspondences
from .init_search import brute_force_histogram, correspondences_from_histogram


class InitResult(NamedTuple):
    success: jnp.ndarray  # bool
    pose: jnp.ndarray  # (4,4) first validated candidate's pose
    det_for_marker: jnp.ndarray  # (M,) its correspondence vector
    bank: jnp.ndarray  # (16,N) SoA particle bank with harvested seeds
    flag: jnp.ndarray  # int32 FailFlag


def _fill_bank_with_seeds(bank16, seeds, seed_mask):
    """Fill bank slots [1..N-1] by cycling valid seeds (slot 0 keeps the
    current pose), reproducing :1756-1760; unchanged if no seeds.

    bank16: (16, N) SoA bank; seeds: (S, 4, 4); seed_mask: (S,).

    The seed pick is a one-hot MATMUL from the (16, S<=32) seed table,
    not a lane gather: a bank-wide gather makes XLA's layout assignment
    prefer the transposed {0,1} layout and propagate it into the
    tracker's cond/scan carries (~160 us per 8x-inflated bank copy at
    N=100k on every frame, even when this branch never executes), and
    under GSPMD sharding it cannot be confined by a Pallas layout pin.
    The matmul is bit-exact (single nonzero per column) and keeps the
    default layout on every backend, sharded or not."""
    n = bank16.shape[1]
    # compact valid seeds to the front
    order = jnp.argsort(~seed_mask)  # valid first, stable
    seeds16 = seeds[order].reshape(-1, 16).T  # (16, S)
    # invalid seeds can be NaN (unsolvable P3P); a gather never touched
    # them, but the one-hot matmul multiplies every column by 0 and
    # 0 * NaN = NaN — zero them (the pick index never selects them)
    seeds16 = jnp.where(seed_mask[order][None, :], seeds16, 0.0)
    s_cap = seeds16.shape[1]
    n_seeds = jnp.sum(seed_mask.astype(jnp.int32))
    idx = jnp.arange(n)
    pick_idx = jnp.where(n_seeds > 0, (n - 1 - idx) % jnp.maximum(n_seeds, 1), 0)
    onehot = (jnp.arange(s_cap)[:, None] == pick_idx[None, :]).astype(bank16.dtype)
    pick = jax.lax.dot_general(
        seeds16, onehot, (((1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
    )  # (16, N)
    use = (idx > 0) & (n_seeds > 0)
    return jnp.where(use[None, :], pick, bank16)


def initialise(
    camera: Camera,
    det: Detections,
    markers_h: jnp.ndarray,
    marker_mask: jnp.ndarray,
    bank: jnp.ndarray,
    config: TrackerConfig,
    dyn: DynamicParams | None = None,
    prefer_near: jnp.ndarray | None = None,
) -> InitResult:
    """prefer_near: optional (4,) [x, y, z, active] — when active > 0,
    a validated candidate within `init_consistency_radius` of this
    translation is preferred over the histogram-rank-first one.  Under
    spurious near-clone blobs the TOP validated candidate is often a
    wrong-but-self-consistent basin; the temporal gate (tracker/step.py)
    would veto it and lose the frame even though a consistent validated
    candidate sat one rank lower."""
    if dyn is None:
        dyn = DynamicParams.from_config(config)
    m_cap = markers_h.shape[0]
    n_markers = jnp.sum(marker_mask.astype(jnp.int32))
    n_det = det.count

    # PF init demands every marker detected (:1505-1512) unless the
    # partial-constellation override is set (see TrackerConfig).
    if config.use_particle_filter:
        if config.pf_init_min_markers > 0:
            min_needed = jnp.minimum(n_markers, config.pf_init_min_markers)
        else:
            min_needed = n_markers
    else:
        min_needed = jnp.asarray(config.min_num_leds_detected, jnp.int32)
    enough_dets = n_det >= min_needed

    hist = brute_force_histogram(camera, det, markers_h, marker_mask, config, dyn)
    hist_nonzero = jnp.any(hist > 0)

    cands = correspondences_from_histogram(
        hist, det.mask, marker_mask, config, initialisation=True
    )

    cand_dfm = cands.det_for_marker  # (R, M)
    cand_valid = cands.valid
    if config.init_drop_one_variants > 0:
        # Under an occlusion + spurious blobs, every FULL candidate can
        # carry exactly one wrong pair: sub-triples containing it yield
        # wrong poses, and sub-triples excluding it see it as an unused
        # pair that fails the certainty gate — so validation rejects all
        # of them (flag 8) even though M-1 pairs are right.  Emitting
        # drop-one-pair variants of the top candidates makes the true
        # partial assignment reachable WITHOUT loosening the reference's
        # certainty/fraction thresholds.  Variants rank after all full
        # candidates, so a validating full set still wins.
        r2 = min(config.init_drop_one_variants, cand_dfm.shape[0])
        top = cand_dfm[:r2]  # (R2, M)
        drop = jnp.where(
            jnp.eye(m_cap, dtype=bool)[None, :, :],  # (1, M, M)
            -1,
            top[:, None, :],  # (R2, 1, M)
        ).reshape(r2 * m_cap, m_cap)
        drop_valid = jnp.repeat(cands.valid[:r2], m_cap)
        cand_dfm = jnp.concatenate([cand_dfm, drop], axis=0)
        cand_valid = jnp.concatenate([cand_valid, drop_valid], axis=0)

    def check_one(det_for_marker):
        return check_correspondences(
            camera,
            det.xy,
            det.mask,
            markers_h,
            marker_mask,
            det_for_marker,
            min_needed,
            config,
            dyn,
        )

    results = jax.vmap(check_one)(cand_dfm)  # over all candidates
    cand_success = results.success & cand_valid

    any_success = jnp.any(cand_success)
    # first (highest-probability) validated candidate (:1746-1751)
    first = jnp.argmax(cand_success)
    if prefer_near is not None and config.init_consistency_radius > 0.0:
        t_err = jnp.linalg.norm(
            results.pose[:, :3, 3] - prefer_near[None, :3], axis=-1
        )
        consistent = (
            cand_success & (t_err <= config.init_consistency_radius)
        ) & (prefer_near[3] > 0)
        if (
            prefer_near.shape[0] >= 13
            and config.init_consistency_rotation_deg > 0.0
        ):
            # rotation leg (round 5): a wrong-basin candidate can sit
            # translationally near the remembered pose but heavily
            # rotated (flipped-mode landings); require the preferred
            # candidate to ALSO be within init_consistency_rotation_deg
            # of the remembered orientation (rows 4..12 = remembered
            # R, row-major)
            r_prev = prefer_near[4:13].reshape(3, 3)
            r_rel = jnp.einsum("cij,kj->cik", results.pose[:, :3, :3], r_prev)
            cos_a = jnp.clip(
                (jnp.trace(r_rel, axis1=1, axis2=2) - 1.0) / 2.0, -1.0, 1.0
            )
            rot_ok = cos_a >= jnp.cos(
                jnp.deg2rad(
                    jnp.asarray(
                        config.init_consistency_rotation_deg, cos_a.dtype
                    )
                )
            )
            consistent = consistent & rot_ok
        first = jnp.where(jnp.any(consistent), jnp.argmax(consistent), first)
    pose = results.pose[first]
    det_for_marker = cand_dfm[first]

    # Harvest seeds in rank order, but ONLY from candidates up to the
    # first validated one — the reference walks the ranked list and stops
    # there (:1733-1755), so later (unchecked, possibly wrong-basin) P3P
    # poses never reach its particle bank.
    rank = jnp.arange(cand_dfm.shape[0])
    walked = rank <= first
    seeds = results.seeds.reshape(-1, 4, 4)
    seed_mask = (results.seed_mask & (cand_valid & walked)[:, None]).reshape(-1)
    s_cap = config.max_p3p_seeds
    order = jnp.argsort(~seed_mask)
    seeds = seeds[order][:s_cap]
    seed_mask = seed_mask[order][:s_cap]
    new_bank = jax.lax.cond(
        any_success,
        lambda: _fill_bank_with_seeds(bank, seeds, seed_mask),
        lambda: bank,
    )

    flag = jnp.where(
        ~enough_dets,
        FailFlag.TOO_FEW_MARKERS_DETECTED,
        jnp.where(
            ~hist_nonzero,
            FailFlag.HISTOGRAM_ALL_ZERO,
            jnp.where(
                ~jnp.any(cands.valid),
                FailFlag.NO_CORR_FROM_HISTOGRAM,
                jnp.where(any_success, FailFlag.INIT_SUCCESS, results.flag[0]),
            ),
        ),
    ).astype(jnp.int32)

    success = enough_dets & hist_nonzero & any_success
    return InitResult(
        success=success,
        pose=jnp.where(success, pose, jnp.eye(4, dtype=pose.dtype)),
        det_for_marker=jnp.where(success, det_for_marker, -1),
        bank=new_bank,
        flag=flag,
    )
