"""Generate the OpenCV camera-model golden fixture (run once, committed).

Produces opencv_camera_golden.npz pinning the plumb-bob distortion /
undistortion / projection conventions of `geometry/camera.py` to OpenCV's
implementation on the mvBlueFOX calibration (io/synthetic.default_camera).
The parity tests load the npz — cv2 is NOT needed at test time, and a
symmetric convention bug in the engine's render+detect pair can no longer
cancel out (round-1 verdict, "self-referential goldens").

Usage:  python tests/golden/make_golden.py
"""

import numpy as np


FX, FY, CX, CY = 621.75, 621.39, 404.95, 238.26
DIST = np.array([-0.36, 0.13, 0.0005, -0.0005, 0.0])  # [k1 k2 p1 p2 k3]
W, H = 752, 480


def main():
    import cv2

    rng = np.random.default_rng(2024)
    k_mat = np.array([[FX, 0, CX], [0, FY, CY], [0, 0, 1.0]])

    # --- forward distortion: undistorted pixels -> distorted pixels.
    # Grid over the frame incl. the corners (worst-case radial) + jitter.
    gx, gy = np.meshgrid(np.linspace(10, W - 10, 9), np.linspace(10, H - 10, 7))
    und_px = np.stack([gx.ravel(), gy.ravel()], -1)
    und_px = np.concatenate(
        [und_px, und_px[:20] + rng.uniform(-3, 3, (20, 2))], axis=0
    )
    norm = (und_px - [CX, CY]) / [FX, FY]
    obj = np.concatenate([norm, np.ones((len(norm), 1))], -1)
    dist_px, _ = cv2.projectPoints(
        obj.reshape(-1, 1, 3), np.zeros(3), np.zeros(3), k_mat, DIST
    )
    dist_px = dist_px.reshape(-1, 2)

    # --- undistortion: distorted pixels -> undistorted pixels
    undist_back = cv2.undistortPoints(
        dist_px.reshape(-1, 1, 2), k_mat, DIST, P=k_mat
    ).reshape(-1, 2)

    # --- full projection of a 3D marker cloud under a nontrivial pose
    markers = np.array(
        [
            [0.0714, 0.0800, 0.0622],
            [0.0400, -0.0912, 0.0317],
            [-0.0647, -0.0879, 0.0830],
            [-0.0558, -0.0165, 0.0534],
            [0.0, 0.12, 0.0],
        ]
    )
    rvec = np.array([0.25, -0.18, 0.31])
    tvec = np.array([0.06, -0.04, 1.35])
    proj_dist, _ = cv2.projectPoints(markers.reshape(-1, 1, 3), rvec, tvec, k_mat, DIST)
    proj_undist, _ = cv2.projectPoints(
        markers.reshape(-1, 1, 3), rvec, tvec, k_mat, np.zeros(5)
    )
    r_mat, _ = cv2.Rodrigues(rvec)

    np.savez_compressed(
        "tests/golden/opencv_camera_golden.npz",
        fx=FX, fy=FY, cx=CX, cy=CY, dist=DIST, width=W, height=H,
        undistorted_pixels=und_px,
        distorted_pixels=dist_px,
        undistorted_back=undist_back,
        markers=markers,
        rotation=r_mat,
        translation=tvec,
        projected_distorted=proj_dist.reshape(-1, 2),
        projected_undistorted=proj_undist.reshape(-1, 2),
        opencv_version=np.bytes_(cv2.__version__.encode()),
    )
    print("wrote tests/golden/opencv_camera_golden.npz (cv2", cv2.__version__, ")")


if __name__ == "__main__":
    main()
