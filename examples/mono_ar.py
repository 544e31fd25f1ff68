#!/usr/bin/env python
"""Augmented-reality demo (reference: Examples/ROS/ORB_SLAM2/src/AR/
ros_mono_ar.cc + ViewerAR.cc).

The reference subscribes to a live ROS camera topic, tracks monocularly,
fits a dominant plane to the well-observed map points (DetectPlane,
ViewerAR.cc:392) and renders a virtual cube on it with Pangolin. This
headless counterpart drives the same pipeline from a dataset directory or
the built-in synthetic world, inserts the cube once tracking is stable,
and writes per-frame overlay PNGs (tracked points + plane grid + cube).

Usage:
  mono_ar.py --synthetic [--out ar_out] [--frames 80] [--insert-at 30]
  mono_ar.py <settings.yaml> <tum_sequence_dir> [--out ar_out]
"""
import os
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np  # noqa: E402

from orb_slam2_with_comment_tpu.runtime import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

import jax  # noqa: E402

from orb_slam2_with_comment_tpu import Sensor, System  # noqa: E402
from orb_slam2_with_comment_tpu.visualization import ar  # noqa: E402
from orb_slam2_with_comment_tpu.visualization.frame_drawer import draw_frame  # noqa: E402


def _save_png(path, img):
    try:
        from PIL import Image
        Image.fromarray(img).save(path)
    except ImportError:  # environment without PIL: raw dump
        np.save(path + ".npy", img)


def _tracked_points(slam):
    """World points with >5 observations (ViewerAR.cc:405: Observations()>5)."""
    m = slam.tracker.map
    n_obs = np.asarray((m.lm_obs_kf >= 0).sum(axis=1))
    valid = np.asarray(m.lm_valid) & (n_obs > 5)
    return np.asarray(m.lm_pw), valid


def main(argv):
    args = [a for a in argv[1:] if not a.startswith("--")]
    opts = {a.split("=")[0]: (a.split("=", 1) + ["1"])[1]
            for a in argv[1:] if a.startswith("--")}
    out_dir = opts.get("--out", "ar_out")
    os.makedirs(out_dir, exist_ok=True)
    insert_at = int(opts.get("--insert-at", 30))
    cube_size = float(opts.get("--cube-size", 0.15))

    if "--synthetic" in opts:
        from orb_slam2_with_comment_tpu.dataio.synthetic import (
            SyntheticWorld, orbit_trajectory)
        n_frames = int(opts.get("--frames", 80))
        world = SyntheticWorld(seed=0)
        poses = orbit_trajectory(n_frames)
        slam = System(sensor=Sensor.MONOCULAR)
        cam = slam.config.cam
        frames = ((world.render(R, t)[0], i) for i, (R, t) in enumerate(poses))
    else:
        if len(args) < 2:
            print(__doc__)
            return 1
        from orb_slam2_with_comment_tpu.dataio.datasets import TumMonoDataset
        ds = TumMonoDataset(args[1])
        slam = System(settings_path=args[0], sensor=Sensor.MONOCULAR)
        cam = slam.config.cam
        frames = ((img, i) for i, (_, img) in enumerate(ds.prefetch()))

    plane = None
    n_drawn = 0
    for img, i in frames:
        T = slam.track_monocular(img, timestamp=i / 30.0)
        if T is None:
            continue
        Rcw, tcw = T[:3, :3], T[:3, 3]
        if plane is None and i >= insert_at:
            pts, valid = _tracked_points(slam)
            det = ar.detect_plane(pts, valid, Rcw, tcw, jax.random.PRNGKey(i))
            if det is not None:
                plane = det[:2]
                print(f"frame {i}: new virtual cube inserted "
                      f"({int(det[2].sum())} plane inliers)")
        obs = slam.tracker.last_obs
        over = draw_frame(np.asarray(img), np.asarray(obs.feats.xy),
                          np.asarray(obs.lm), np.asarray(obs.feats.valid),
                          state="OK", n_kf=slam.tracker.n_kf_host,
                          n_lm=int(np.asarray(slam.tracker.map.lm_valid).sum()))
        if plane is not None:
            over[:img.shape[0]] = ar.draw_ar(
                over[:img.shape[0]], cam, Rcw, tcw, *plane,
                cube_size=cube_size)
        _save_png(os.path.join(out_dir, f"ar_{i:05d}.png"), over)
        n_drawn += 1
    slam.shutdown()
    print(f"wrote {n_drawn} overlay frames to {out_dir}/")
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv))
