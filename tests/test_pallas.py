"""Pallas detection-kernel parity (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from pf_monocular_pose_estimator_tpu.ops.blob import _blur
from pf_monocular_pose_estimator_tpu.ops.pallas_kernels import threshold_blur_pallas


def _jax_reference(img, roi, threshold, sigma, active):
    h, w = img.shape
    xs = jnp.arange(w)[None, :]
    ys = jnp.arange(h)[:, None]
    in_roi = (xs >= roi[0]) & (xs < roi[0] + roi[2]) & (ys >= roi[1]) & (ys < roi[1] + roi[3])
    if active:
        tz = jnp.where(img > threshold, img, 0.0)
    else:
        tz = jnp.where(img > threshold, 0.0, 255.0)
    return _blur(jnp.where(in_roi, tz, 0.0), sigma)


def test_threshold_blur_pallas_matches_reference(rng):
    img = jnp.asarray(rng.uniform(0, 255, (96, 160)).astype(np.float32))
    roi = jnp.asarray([10, 8, 120, 70], jnp.float32)
    got = threshold_blur_pallas(img, roi, 240.0, 0.6, True, interpret=True)
    want = _jax_reference(img, roi, 240.0, 0.6, True)
    # interiors must match exactly; borders differ (zero vs reflect pad)
    diff = np.abs(np.asarray(got - want))[3:-3, 3:-3]
    assert diff.max() < 1e-3


def test_threshold_blur_pallas_passive_markers(rng):
    img = jnp.asarray(rng.uniform(0, 255, (96, 160)).astype(np.float32))
    roi = jnp.asarray([0, 0, 160, 96], jnp.float32)
    got = threshold_blur_pallas(img, roi, 60.0, 0.6, False, interpret=True)
    want = _jax_reference(img, roi, 60.0, 0.6, False)
    diff = np.abs(np.asarray(got - want))[3:-3, 3:-3]
    assert diff.max() < 1e-3


def test_threshold_blur_pallas_roi_masking(rng):
    img = jnp.full((96, 160), 255.0, jnp.float32)
    roi = jnp.asarray([40, 30, 20, 20], jnp.float32)
    got = np.asarray(threshold_blur_pallas(img, roi, 240.0, 0.6, True, interpret=True))
    # outside the (blur-expanded) ROI everything is zero
    assert got[:25, :].max() == 0.0
    assert got[:, :35].max() == 0.0
    assert got[35, 45] > 0.0
