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


def test_fused_detect_stats_matches_xla_path():
    """The fully-fused Pallas front-end (threshold+blur+CC+moments in one
    pass) must agree with the XLA `_detect_blobs` chain on a rendered
    crop: same detections, same centroids (sub-1e-2 px), same areas."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from pf_monocular_pose_estimator_tpu.io.synthetic import (
        default_camera,
        demo_markers,
        render_frame,
    )
    from pf_monocular_pose_estimator_tpu.geometry.se3 import exp_se3
    from pf_monocular_pose_estimator_tpu.ops.blob import (
        BlobParams,
        _detect_blobs,
        _detect_blobs_fused,
    )

    camera = default_camera()
    markers = demo_markers()
    pose = np.array(
        exp_se3(jnp.asarray([0.0, 0.0, 0.0, 0.05, -0.05, 0.02], jnp.float32))
    )
    pose[2, 3] += 1.3
    frame = render_frame(camera, jnp.asarray(pose), markers)
    # crop around the blob cluster (the tracking-path geometry)
    crop = jnp.asarray(frame[128:320, 256:512])
    roi = jnp.asarray([8.0, 8.0, 240.0, 176.0], jnp.float32)
    params = BlobParams(min_blob_area=8.0, use_pallas=True)

    xy_x, mask_x, area_x = _detect_blobs(
        crop, roi, params, jnp.float32(8.0), jnp.float32(160.0)
    )
    xy_p, mask_p, area_p = _detect_blobs_fused(
        crop, roi, params, jnp.float32(8.0), jnp.float32(160.0), interpret=True
    )
    np.testing.assert_array_equal(np.asarray(mask_x), np.asarray(mask_p))
    m = np.asarray(mask_x)
    assert m.sum() >= 4
    np.testing.assert_allclose(
        np.asarray(xy_x)[m], np.asarray(xy_p)[m], atol=1e-2
    )
    np.testing.assert_allclose(np.asarray(area_x)[m], np.asarray(area_p)[m], atol=0.5)
