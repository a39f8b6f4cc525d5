"""Recorded-sequence container (io/seqio.py + native/seqio.cpp): the
rosbag-replay analogue.  Round-trips, native<->python format
compatibility, truncation robustness, and tracker replay."""

import os
import shutil

import numpy as np
import pytest

from pf_monocular_pose_estimator_tpu.io.seqio import (
    SequenceReader,
    SequenceWriter,
    _native_available,
    record_sequence,
)

HAVE_CXX = shutil.which("g++") is not None and _native_available()


def _demo(t=7, h=24, w=32, seed=0):
    rng = np.random.default_rng(seed)
    frames = rng.integers(0, 256, (t, h, w), dtype=np.uint8)
    times = np.arange(t) / 50.0 + 0.25
    return frames, times


@pytest.mark.parametrize("native", [False] + ([True] if HAVE_CXX else []))
def test_roundtrip(tmp_path, native):
    frames, times = _demo()
    path = str(tmp_path / "seq.pfsq")
    record_sequence(path, frames, times, native=native)
    with SequenceReader(path, native=native) as r:
        assert (r.n_frames, r.height, r.width) == frames.shape
        got, ts = r.arrays()
    np.testing.assert_array_equal(got, frames)
    np.testing.assert_allclose(ts, times)


@pytest.mark.skipif(not HAVE_CXX, reason="no native toolchain")
@pytest.mark.parametrize("w_native,r_native", [(True, False), (False, True)])
def test_native_python_format_compatible(tmp_path, w_native, r_native):
    frames, times = _demo(seed=3)
    path = str(tmp_path / "seq.pfsq")
    record_sequence(path, frames, times, native=w_native)
    with SequenceReader(path, native=r_native) as r:
        got, ts = r.arrays()
    np.testing.assert_array_equal(got, frames)
    np.testing.assert_allclose(ts, times)


def test_truncated_file_clamps(tmp_path):
    frames, times = _demo()
    path = str(tmp_path / "seq.pfsq")
    record_sequence(path, frames, times, native=False)
    full = os.path.getsize(path)
    frame_bytes = 8 + frames.shape[1] * frames.shape[2]
    with open(path, "r+b") as f:
        f.truncate(full - frame_bytes - 1)  # chop the last frame mid-way
    with SequenceReader(path, native=False) as r:
        assert r.n_frames == frames.shape[0] - 2  # last full frame lost too
        got, _ = r.arrays()
    np.testing.assert_array_equal(got, frames[: r.n_frames + 0])


def test_zero_copy_view(tmp_path):
    frames, times = _demo()
    path = str(tmp_path / "seq.pfsq")
    record_sequence(path, frames, times, native=False)
    r = SequenceReader(path, native=False)
    px, t = r.frame(3)
    assert px.base is not None  # a view into the mapping, not a copy
    np.testing.assert_array_equal(px, frames[3])
    assert t == times[3]


def test_tracker_replays_recorded_sequence(tmp_path):
    """Record a rendered synthetic sequence into the container, replay it
    through the tracker (SURVEY §4 bag-replay role)."""
    import jax
    import jax.numpy as jnp

    from pf_monocular_pose_estimator_tpu.io.synthetic import (
        default_camera,
        demo_markers,
        make_orbit_sequence,
    )
    from pf_monocular_pose_estimator_tpu.tracker import TargetState, make_tracker
    from pf_monocular_pose_estimator_tpu.utils import TrackerConfig

    camera, markers = default_camera(), demo_markers()
    mask = jnp.ones((markers.shape[0],), bool)
    seq = make_orbit_sequence(camera, markers, num_frames=8, fps=50.0)
    path = str(tmp_path / "orbit.pfsq")
    record_sequence(
        path, np.clip(np.asarray(seq.frames), 0, 255).astype(np.uint8),
        np.asarray(seq.times),
    )

    config = TrackerConfig(n_particles=1024, min_blob_area=8.0, pf_max_retries=4)
    step = make_tracker(camera, markers, mask, config)
    state = TargetState.create(config.n_particles, jax.random.PRNGKey(0))
    tracked = 0
    with SequenceReader(path) as r:
        for i in range(r.n_frames):
            px, t = r.frame(i)
            state, res = step(state, jnp.asarray(px, jnp.float32), t)
            tracked += bool(res.pose_updated)
    assert tracked >= 6
