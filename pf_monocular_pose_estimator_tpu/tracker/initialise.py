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


def _fill_bank_with_seeds(bank16, seeds, seed_mask, allow_pallas: bool = True):
    """Fill bank slots [1..N-1] by cycling valid seeds (slot 0 keeps the
    current pose), reproducing :1756-1760; unchanged if no seeds.

    bank16: (16, N) SoA bank; seeds: (S, 4, 4); seed_mask: (S,)."""
    n = bank16.shape[1]
    # compact valid seeds to the front
    order = jnp.argsort(~seed_mask)  # valid first, stable
    seeds16 = seeds[order].reshape(-1, 16).T  # (16, S)
    n_seeds = jnp.sum(seed_mask.astype(jnp.int32))
    idx = jnp.arange(n)
    pick = seeds16[:, jnp.where(n_seeds > 0, (n - 1 - idx) % jnp.maximum(n_seeds, 1), 0)]
    use = (idx > 0) & (n_seeds > 0)
    out = jnp.where(use[None, :], pick, bank16)
    if allow_pallas and jax.default_backend() != "cpu":
        # this bank-wide lane gather is the rare-branch sibling of the
        # resampling gather: without the pin its {0,1} layout preference
        # leaks into the tracker cond signature and the scan carry, and
        # the HOT path then pays ~300 us/frame of 8x-inflated layout
        # copies even on frames where this branch never executes
        from ..pf.pallas_step import bank_layout_pin

        out = bank_layout_pin(out)
    return out


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
        lambda: _fill_bank_with_seeds(bank, seeds, seed_mask, config.use_fused_pf_kernel),
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
