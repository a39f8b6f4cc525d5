"""Native frame-pipeline tests (ring buffer, red extraction, replay)."""

import time

import numpy as np
import pytest

from pf_monocular_pose_estimator_tpu.io.framepipe import FramePipe, PyFramePipe


@pytest.fixture(scope="module")
def pipe():
    return FramePipe(64, 48, capacity=4)


def test_push_pop_grayscale_roundtrip(pipe):
    frame = np.random.default_rng(0).integers(0, 255, (48, 64), np.uint8)
    seq = pipe.push(frame, 1.25)
    out = pipe.pop(timeout_ms=500)
    assert out is not None
    got, ts, oseq = out
    np.testing.assert_array_equal(got, frame)
    assert ts == 1.25 and oseq == seq


def test_red_channel_extraction(pipe):
    bgr = np.zeros((48, 64, 3), np.uint8)
    bgr[..., 0] = 10  # blue
    bgr[..., 1] = 20  # green
    bgr[..., 2] = 99  # red
    pipe.push(bgr, 2.0)
    got, _, _ = pipe.pop(timeout_ms=500)
    assert (got == 99).all()


def test_pop_timeout(pipe):
    t0 = time.monotonic()
    assert pipe.pop(timeout_ms=80) is None
    assert time.monotonic() - t0 >= 0.07


def test_drop_oldest_when_full():
    p = FramePipe(8, 8, capacity=3)
    for i in range(6):
        p.push(np.full((8, 8), i, np.uint8), float(i))
    stats = p.stats
    assert stats["pushed"] == 6
    assert stats["dropped"] >= 3
    # remaining frames are the newest ones, in order
    vals = []
    while True:
        out = p.pop(timeout_ms=10)
        if out is None:
            break
        vals.append(int(out[0][0, 0]))
    assert vals == sorted(vals)
    assert vals[-1] == 5


def test_pop_latest_skips_stale():
    p = FramePipe(8, 8, capacity=8)
    for i in range(5):
        p.push(np.full((8, 8), i, np.uint8), float(i))
    got, ts, seq, skipped = p.pop_latest(timeout_ms=100)
    assert int(got[0, 0]) == 4
    assert skipped == 4
    assert p.stats["pending"] == 0


def test_native_replay_thread():
    frames = np.stack([np.full((8, 8), i, np.uint8) for i in range(10)])
    p = FramePipe(8, 8, capacity=16)
    p.start_replay(frames, fps=200.0, t0=5.0)
    got = []
    for _ in range(10):
        out = p.pop(timeout_ms=1000)
        assert out is not None
        got.append((int(out[0][0, 0]), out[1]))
    p.stop_replay()
    assert [g[0] for g in got] == list(range(10))
    np.testing.assert_allclose([g[1] for g in got], 5.0 + np.arange(10) / 200.0)


def test_python_fallback_equivalent():
    p = PyFramePipe(8, 8, capacity=3)
    bgr = np.zeros((8, 8, 3), np.uint8)
    bgr[..., 2] = 42
    p.push(bgr, 0.5)
    got, ts, seq = p.pop(timeout_ms=100)
    assert (got == 42).all() and ts == 0.5 and seq == 0
