"""End-to-end reference pipeline oracle: a faithful CPU port of the
PF branch of PoseEstimator::estimateBodyPose, driven by OpenCV detection.

Purpose: run the SAME synthetic sequence through this port and through
the engine, and compare trajectories — the reference pipeline (not the
engine's own geometry) is the accuracy yardstick (BASELINE.md: "the
reference pipeline itself, or a faithful CPU port, is the accuracy
oracle").

Ported behaviour (pf_mpe_lib/src/pose_estimator.cpp):
  * init dispatch on it_since_initialized_, uncertainty-grown ROI
    (:128-143), init via tests/oracle/ref_oracle.initialise (:1503-1786),
    the current_pose:=unoptimised-init-pose hack (:180), GN refine;
  * tracking: predictPose const-velocity (:995-1010), PF retry loop with
    particles 0/1 pinned to current/predicted pose, Rz*Ry*Rx uniform
    noise, noise-factor schedule (:489-507), inflation every 10 iters,
    best-iteration snapshot, exit gate M*min(5,numLED) (:535-616);
  * acceptance gate M*min(3,numLED), uncertainty ladder (:633-719; the
    2/3*numLED marginal margin is C++ integer division = 0, so the
    short-P3P branch never fires — faithfully reproduced by omission);
  * stratified resampling (i+U)/N with most-resampled -> GN (:668-690);
  * optimiseAndUpdatePose / updatePose (:2011-2035).

Detection is genuine OpenCV, as in the reference (led_detector.cpp:
46-215): threshold TOZERO -> GaussianBlur(ksize=0, sigma) ->
findContours -> contourArea/aspect/circularity filters -> moment
centroids -> cv2.undistortPoints.  Documented delta: detection runs on
the full frame instead of the tracked ROI (equivalent on clean synthetic
frames, which contain nothing but the marker blobs).
"""

from __future__ import annotations

import numpy as np

from . import ref_oracle as ref


def find_leds_opencv(
    frame_u8,
    threshold_value,
    gaussian_sigma,
    min_blob_area,
    max_blob_area,
    max_width_height_distortion,
    max_circular_distortion,
    k_mat,
    dist_coeffs,
):
    """led_detector.cpp:46-215 with real OpenCV calls.  Returns (K,2)
    undistorted pixel centroids (float64)."""
    import cv2

    _, bw = cv2.threshold(frame_u8, threshold_value, 255, cv2.THRESH_TOZERO)
    blurred = cv2.GaussianBlur(bw, (0, 0), gaussian_sigma, gaussian_sigma)
    contours, _ = cv2.findContours(blurred, cv2.RETR_EXTERNAL, cv2.CHAIN_APPROX_NONE)
    distorted = []
    for c in contours:
        area = cv2.contourArea(c)
        x, y, w, h = cv2.boundingRect(c)
        mu = cv2.moments(c)
        if mu["m00"] == 0:
            continue
        mc = (mu["m10"] / mu["m00"], mu["m01"] / mu["m00"])
        if (
            area >= min_blob_area
            and area <= max_blob_area
            and abs(1 - min(w / h, h / w)) <= max_width_height_distortion
            and abs(1 - (area / (np.pi * (w / 2) ** 2))) <= max_circular_distortion
            and abs(1 - (area / (np.pi * (h / 2) ** 2))) <= max_circular_distortion
        ):
            distorted.append(mc)
    if not distorted:
        return np.zeros((0, 2))
    pts = np.asarray(distorted, np.float64).reshape(-1, 1, 2)
    undist = cv2.undistortPoints(pts, k_mat, dist_coeffs, P=k_mat)
    return undist.reshape(-1, 2)


class OracleTracker:
    """Single-target CPU port of the PF tracker state machine."""

    def __init__(
        self,
        fx,
        fy,
        cx,
        cy,
        dist,
        markers4,
        n_particles=300,
        threshold_value=240,
        gaussian_sigma=0.6,
        min_blob_area=0.01,
        max_blob_area=500.0,
        max_width_height_distortion=0.7,
        max_circular_distortion=0.7,
        back_projection_pixel_tolerance=5.0,
        back_projection_pixel_tolerance_pf=10.0,
        min_translation_noise=-0.025,
        max_translation_noise=0.025,
        min_angular_noise=-0.02,
        max_angular_noise=0.02,
        seed=0,
    ):
        self.fx, self.fy, self.cx, self.cy = fx, fy, cx, cy
        self.k_mat = np.array([[fx, 0, cx], [0, fy, cy], [0, 0, 1]], np.float64)
        # OpenCV plumb_bob order [k1,k2,p1,p2,k3] matches the engine's
        self.dist = np.asarray(dist, np.float64)
        self.markers = np.asarray(markers4, np.float64)
        self.m = len(self.markers)
        self.n = n_particles
        self.p = dict(
            threshold_value=threshold_value,
            gaussian_sigma=gaussian_sigma,
            min_blob_area=min_blob_area,
            max_blob_area=max_blob_area,
            max_width_height_distortion=max_width_height_distortion,
            max_circular_distortion=max_circular_distortion,
            tol=back_projection_pixel_tolerance,
            tol_pf=back_projection_pixel_tolerance_pf,
            noise_t=(min_translation_noise, max_translation_noise),
            noise_r=(min_angular_noise, max_angular_noise),
        )
        self.rng = np.random.default_rng(seed)
        self.current_pose = np.eye(4)
        self.previous_pose = np.eye(4)
        self.predicted_pose = np.eye(4)
        self.current_time = 0.0
        self.previous_time = -1.0
        self.it_since_initialized = 0
        self.uncertainty = 0
        self.particles = [np.eye(4) for _ in range(self.n)]
        self.resampled = [np.eye(4) for _ in range(self.n)]

    # --- helpers -----------------------------------------------------
    def _project_all(self, pose):
        uv = []
        for j in range(self.m):
            uv.append(ref.project2d(self.markers[j], pose, self.fx, self.fy, self.cx, self.cy))
        return np.stack(uv)

    def _update_pose(self, t):
        """updatePose (:2011-2021)."""
        self.previous_pose = self.current_pose
        self.current_pose = self.predicted_pose
        if t - self.current_time > 0.001 or t < self.current_time:
            self.previous_time = self.current_time
            self.current_time = t

    def _optimise_and_update(self, correspondences, detections, t):
        pose, cov, _ = ref.optimise_pose(
            self.predicted_pose,
            correspondences,
            detections,
            self.markers,
            self.fx,
            self.fy,
            self.cx,
            self.cy,
        )
        self.predicted_pose = pose
        self.covariance = cov
        if self.it_since_initialized < 2:
            self.it_since_initialized += 1
        self._update_pose(t)

    # --- per-frame ----------------------------------------------------
    def step(self, frame_u8, t):
        """Returns (pose_updated: bool, flag: int) and updates state.
        Estimated pose after a successful frame: self.current_pose."""
        detections = find_leds_opencv(
            frame_u8,
            self.p["threshold_value"],
            self.p["gaussian_sigma"],
            self.p["min_blob_area"],
            self.p["max_blob_area"],
            self.p["max_width_height_distortion"],
            self.p["max_circular_distortion"],
            self.k_mat,
            self.dist,
        )
        if getattr(self, "fault_fn", None) is not None:
            detections = self.fault_fn(detections)
        num_led = len(detections)

        if self.it_since_initialized < 1:
            return self._init_frame(detections, t)
        return self._track_frame(detections, num_led, t)

    def _init_frame(self, detections, t):
        if len(detections) < self.m:
            self.uncertainty += 2
            return False, 100  # FailFlag 10: too few markers for init
        ok, pose, corr, seeds = ref.initialise(
            detections, self.markers, self.fx, self.fy, self.cx, self.cy, self.p["tol"]
        )
        if not ok:
            self.uncertainty += 1
            return False, 30
        self.predicted_pose = pose
        self.current_pose = pose  # the init hack (:180)
        # seed the bank with harvested P3P poses (:1756-1760)
        if seeds:
            for i in range(1, self.n):
                self.resampled[i] = seeds[(self.n - 1 - i) % len(seeds)]
        self.it_since_initialized = 1
        self._optimise_and_update(corr, detections, t)
        return True, 0

    def _track_frame(self, detections, num_led, t):
        dt_frames = max(self.current_time - self.previous_time, 1e-6)
        delta = ref.logarithm_map(np.linalg.inv(self.previous_pose) @ self.current_pose)
        prediction = ref.exponential_map(delta / dt_frames * (t - self.current_time))
        self.predicted_pose = self.current_pose @ prediction

        if num_led == 0:
            self.uncertainty += 1
            self.it_since_initialized = 0
            return False, 40

        # noise-factor schedule (:489-507)
        if self.it_since_initialized == 1:
            fac_t = np.ones(3)
            fac_r = np.ones(3)
        else:
            td = max(t - self.current_time, 1e-6)
            f = min(max(0.2, abs(prediction[0, 3]) / td), 1.0) / 4
            fac_t = np.full(3, f)
            fac_r = np.full(3, 0.2)

        lo_t, hi_t = self.p["noise_t"]
        lo_r, hi_r = self.p["noise_r"]
        tracking = self.it_since_initialized > 1

        best = None  # (highest, particles, pairs_list, probs)
        highest = 0.0
        exit_gate = self.m * min(5, num_led)
        it = 0
        while it < 80 and highest < exit_gate:
            inflation = 1 + 0.025 * np.floor(it / 10)
            probs = np.zeros(self.n)
            pairs_list = [None] * self.n
            for np_i in range(self.n):
                if np_i == 0:
                    self.particles[np_i] = self.current_pose.copy()
                elif np_i == 1:
                    self.particles[np_i] = self.predicted_pose.copy()
                else:
                    if tracking and (it % 10) != 0:
                        base = self.resampled[np_i] @ prediction
                    else:
                        base = self.resampled[np_i]
                    a = self.rng.uniform(lo_r * fac_r[0] * inflation, hi_r * fac_r[0] * inflation)
                    b = self.rng.uniform(lo_r * fac_r[1] * inflation, hi_r * fac_r[1] * inflation)
                    c = self.rng.uniform(lo_r * fac_r[2] * inflation, hi_r * fac_r[2] * inflation)
                    ca, sa, cb, sb, cc, sc = (
                        np.cos(a), np.sin(a), np.cos(b), np.sin(b), np.cos(c), np.sin(c),
                    )
                    # rotZ(c) @ rotY(b) @ rotX(a), as PoseParticle_temp*rotZ*rotY*rotX
                    rot = (
                        np.array([[cc, -sc, 0], [sc, cc, 0], [0, 0, 1.0]])
                        @ np.array([[cb, 0, sb], [0, 1.0, 0], [-sb, 0, cb]])
                        @ np.array([[1.0, 0, 0], [0, ca, -sa], [0, sa, ca]])
                    )
                    p_new = base.copy()
                    p_new[:3, :3] = base[:3, :3] @ rot
                    for ax in range(3):
                        p_new[ax, 3] = base[ax, 3] + self.rng.uniform(
                            lo_t * fac_t[ax] * inflation, hi_t * fac_t[ax] * inflation
                        )
                    self.particles[np_i] = p_new
                uv = self._project_all(self.particles[np_i])
                prob, pairs = ref.calculate_estimation_probability(
                    detections, uv, self.p["tol_pf"], self.p["tol"], self.m
                )
                probs[np_i] = prob
                pairs_list[np_i] = pairs
            it += 1
            if probs.max() > highest:
                highest = probs.max()
                best = (probs.copy(), [p.copy() for p in self.particles], list(pairs_list))

        probs, particles, pairs_list = best
        prob_sum = probs.sum()
        if prob_sum != 0:
            probs = probs / prob_sum
        most_likely = int(np.argmax(probs))

        accept_gate = self.m * min(3, num_led)
        if prob_sum != 0 and highest > accept_gate:
            flag = 10
            # marginal margin is 2/3*numLED with C++ int division == 0:
            # the short-P3P branch is unreachable; only the uncertainty
            # reset on the healthy path survives (:700-702)
            self.uncertainty = 1
            # stratified resampling (:668-682)
            counter = np.zeros(self.n, np.int64)
            for nr in range(self.n):
                rand_var = (nr + self.rng.uniform()) / self.n
                acc = 0.0
                idx = self.n - 1
                for ip in range(self.n):
                    acc += probs[ip]
                    if acc >= rand_var:
                        idx = ip
                        break
                counter[idx] += 1
                self.resampled[nr] = particles[idx]
            most_resampled = int(np.argmax(counter))
            self.predicted_pose = particles[most_resampled]
            corr = pairs_list[most_resampled]
            pre = self.predicted_pose.copy()
            self._optimise_and_update(corr, detections, t)
            if np.abs(pre[:3, :3] - self.predicted_pose[:3, :3]).max() >= 0.3:
                flag = 15
            return True, flag
        else:
            self.uncertainty += 1
            self.it_since_initialized = 0
            self.predicted_pose = particles[most_likely]
            return False, 40


def inject_faults_np(rng, detections, num_occlusions, num_false):
    """led_detector.cpp:417-488 semantics in numpy: coin-flip removal of
    up to `num_occlusions` random detections, plus `num_false` clones of
    random detections offset by +-(1..5) px per axis."""
    det = list(detections)
    for _ in range(num_occlusions):
        if det and rng.random() < 0.5:
            det.pop(rng.integers(0, len(det)))
    base = list(det)
    for _ in range(num_false):
        if base:
            src = base[rng.integers(0, len(base))]
            off = rng.choice([-1, 1], 2) * rng.integers(1, 6, 2)
            det.append(src + off)
    return np.asarray(det).reshape(-1, 2)


def run_sequence(
    frames_u8,
    times,
    markers4,
    camera_params,
    n_particles=300,
    seed=0,
    num_occlusions=0,
    num_false_detections=0,
    **kw,
):
    """Drive the oracle tracker over a sequence.  Returns (poses (T,4,4),
    updated (T,), flags (T,))."""
    fault_rng = np.random.default_rng(seed + 1000)
    tracker = OracleTracker(
        camera_params["fx"],
        camera_params["fy"],
        camera_params["cx"],
        camera_params["cy"],
        camera_params["dist"],
        markers4,
        n_particles=n_particles,
        seed=seed,
        **kw,
    )
    if num_occlusions or num_false_detections:
        tracker.fault_fn = lambda d: inject_faults_np(
            fault_rng, d, num_occlusions, num_false_detections
        )
    poses, updated, flags = [], [], []
    for i in range(len(frames_u8)):
        ok, flag = tracker.step(frames_u8[i], float(times[i]))
        poses.append(tracker.current_pose.copy())
        updated.append(ok)
        flags.append(flag)
    return np.stack(poses), np.asarray(updated), np.asarray(flags)
