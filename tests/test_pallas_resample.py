"""Sort-free Pallas resampler: canonical-map exactness + fallback safety.

Pins (a) that `probe_rank` reproduces the canonical fixed-association
assignment (the distributed resampler's map at P=1) exactly — counts sum
to N and the implied ancestors match the closed-form inversion; (b) that
the windowed decode kernel (interpret mode on CPU) is slot-for-slot
exact against the rank oracle when its coverage holds; (c) that the
coverage `lax.cond` falls back to the provided resampler — never
returning wrong slots — on weight profiles whose ancestor spread exceeds
the window (measured reality: steady-state tracker weights carry ~40%
zero-weight lanes whose dead runs spread a 1024-slot block's ancestors
over up to 40 chunks, so production uses the ESS gate + sort path and
this kernel stays an opt-in for concentrated/benign regimes); and
(d) the static-shape guards route straight to the fallback.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pf_monocular_pose_estimator_tpu.pf.pallas_resample import (
    probe_rank,
    resample_bank_pallas,
)
from pf_monocular_pose_estimator_tpu.pf.soa import (
    gather_soa,
    stratified_resample_soa,
)


def _fallback(key, weights, bank16):
    anc, counts, most = stratified_resample_soa(key, weights)
    return gather_soa(bank16, anc), most


def _mark_fallback(key, weights, bank16):
    """Sentinel fallback: lets a test detect which branch ran."""
    return jnp.full_like(bank16, -123.0), jnp.int32(-1)


def _rank_oracle_anc(key, weights):
    rank, counts, _ = jax.jit(probe_rank)(key, weights)
    counts = np.asarray(counts)
    anc = np.repeat(np.arange(weights.shape[0]), counts)
    return anc


class TestProbeRank:
    def test_counts_partition_slots(self):
        n = 4096
        key = jax.random.PRNGKey(3)
        w = jax.nn.softmax(1.5 * jax.random.normal(key, (n,)))
        rank, counts, most = jax.jit(probe_rank)(key, w)
        counts = np.asarray(counts)
        assert counts.sum() == n
        assert counts.min() >= 0
        assert int(most) == int(np.argmax(counts))
        # rank is the inclusive prefix of counts and monotone
        r = np.asarray(rank)
        assert np.all(np.diff(r) >= 0)
        assert r[-1] == n

    def test_matches_sort_resampler_assignment(self):
        # the canonical map and the value-sorted map may differ only in
        # measure-zero ulp pockets (differing CDF associations)
        n = 8192
        key = jax.random.PRNGKey(11)
        w = jax.nn.softmax(2.0 * jax.random.normal(key, (n,)))
        anc_probe = _rank_oracle_anc(key, w)
        anc_sort, _, _ = jax.jit(stratified_resample_soa)(key, w)
        mismatch = np.mean(anc_probe != np.asarray(anc_sort))
        assert mismatch < 0.01

    def test_zero_weight_lanes_get_no_slots(self):
        n = 2048
        key = jax.random.PRNGKey(5)
        w = jnp.where(jnp.arange(n) % 3 == 0, 0.0, 1.0)
        _, counts, _ = jax.jit(probe_rank)(key, w / jnp.sum(w))
        counts = np.asarray(counts)
        assert counts[::3].sum() == 0
        assert counts.sum() == n


class TestDecodeKernel:
    @pytest.mark.parametrize("n", [2048, 4000])
    def test_exact_vs_rank_oracle_interpret(self, n):
        key = jax.random.PRNGKey(7)
        kw, kb, kr = jax.random.split(key, 3)
        w = jax.nn.softmax(0.8 * jax.random.normal(kw, (n,)))
        bank = jax.random.normal(kb, (16, n), jnp.float32)
        out, most = resample_bank_pallas(
            kr, w, bank, _mark_fallback, interpret=True
        )
        out = np.asarray(out)
        assert not np.all(out == -123.0), "unexpected fallback"
        anc = _rank_oracle_anc(kr, w)
        np.testing.assert_array_equal(out, np.asarray(bank)[:, anc])

    def test_spread_ancestors_fall_back(self):
        # a single spike is perfectly LOCAL (all ancestors one lane —
        # covered), and isolated spikes get per-block windows; what
        # breaks coverage is SPREAD *within one block*: a dead-DENSE
        # first half (1 live lane in 8) makes block 0's slots consume
        # ancestors across the whole sparse region and beyond — wider
        # than the 12-chunk (1536-lane) window -> covered=False.  This
        # is the measured production profile in miniature (~40%
        # zero-weight lanes with long dead runs).
        n = 4096
        key = jax.random.PRNGKey(9)
        kw, kb, kr = jax.random.split(key, 3)
        lane = jnp.arange(n)
        w = jnp.where(lane < n // 2, (lane % 8 == 0).astype(jnp.float32), 1.0)
        w = w / jnp.sum(w)
        bank = jax.random.normal(kb, (16, n), jnp.float32)
        out, most = resample_bank_pallas(
            kr, w, bank, _mark_fallback, interpret=True
        )
        assert np.all(np.asarray(out) == -123.0)
        assert int(most) == -1

    def test_fallback_result_is_production_resampler(self):
        n = 2048
        key = jax.random.PRNGKey(13)
        kw, kb, kr = jax.random.split(key, 3)
        w = jnp.full((n,), 1e-9).at[100].set(0.7).at[1800].set(0.3)
        w = w / jnp.sum(w)
        bank = jax.random.normal(kb, (16, n), jnp.float32)
        out, most = resample_bank_pallas(
            kr, w, bank, _fallback, interpret=True
        )
        ref, ref_most = _fallback(kr, w, bank)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))
        assert int(most) == int(ref_most)

    def test_small_n_routes_to_fallback(self):
        n = 512  # < win_chunks*128
        key = jax.random.PRNGKey(1)
        kw, kb, kr = jax.random.split(key, 3)
        w = jnp.ones((n,)) / n
        bank = jax.random.normal(kb, (16, n), jnp.float32)
        out, most = resample_bank_pallas(
            kr, w, bank, _mark_fallback, interpret=True
        )
        assert np.all(np.asarray(out) == -123.0)


class TestTrackerWiring:
    """Round-5 (VERDICT r4 #6): `TrackerConfig.use_pallas_resample` routes
    the tracker's resample stage through `resample_bank_pallas` (with the
    sort path as its coverage fallback) on accelerator backends, and is a
    clean no-op on CPU."""

    def _run_steps(self, config, frames=4):
        from pf_monocular_pose_estimator_tpu.io.synthetic import (
            default_camera,
            demo_markers,
            render_frame,
        )
        from pf_monocular_pose_estimator_tpu.tracker import (
            TargetState,
            make_tracker,
        )
        from pf_monocular_pose_estimator_tpu.geometry.se3 import exp_se3

        camera = default_camera()
        markers = demo_markers()
        pose = np.array(
            exp_se3(jnp.asarray([0.0, 0.0, 0.0, 0.1, -0.1, 0.05], jnp.float32))
        )
        pose[2, 3] += 1.0
        img = render_frame(camera, jnp.asarray(pose), markers, blob_sigma=1.5)
        step = make_tracker(camera, markers, jnp.ones(5, bool), config)
        state = TargetState.create(
            config.n_particles, jax.random.PRNGKey(3), (camera.width, camera.height)
        )
        results = []
        for i in range(frames):
            state, res = step(state, img, jnp.asarray(0.02 * (i + 1), jnp.float32))
            results.append(res)
        return state, results

    def test_flag_is_noop_on_cpu_and_step_runs(self):
        from pf_monocular_pose_estimator_tpu.utils import TrackerConfig

        base = dict(
            n_particles=2048,
            threshold_value=150.0,
            min_blob_area=3.0,
            pf_max_retries=4,
            max_detections=12,
            max_correspondence_candidates=8,
            roi_particle_subsample=16,
            resample_min_ess=0.0,  # force the resample stage every frame
        )
        s_off, r_off = self._run_steps(TrackerConfig(**base))
        s_on, r_on = self._run_steps(
            TrackerConfig(**base, use_pallas_resample=True)
        )
        if jax.default_backend() == "cpu":
            # gated off -> bit-identical program
            np.testing.assert_array_equal(
                np.asarray(s_off.bank), np.asarray(s_on.bank)
            )
        for a, b in zip(r_off, r_on):
            assert int(a.fail_flag) == int(b.fail_flag)
            # the Pallas decode computes the same canonical assignment
            # (chunked fixed-association CDF) as the sort path; its
            # fallback IS the sort path — trajectories agree
            np.testing.assert_allclose(
                np.asarray(a.pose), np.asarray(b.pose), atol=1e-4
            )
