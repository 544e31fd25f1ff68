#!/usr/bin/env python
"""Deterministic downsampled dataset FIXTURES in real dataset formats.

The benchmark datasets themselves (TUM RGB-D, KITTI odometry, EuRoC) are
not downloadable from this environment (zero egress — see RESULTS.md for
the documented attempt). These fixtures exercise the ENTIRE real-dataset
path bit-for-bit — PNG decode, list/association parsing, YAML settings,
System drivers, trajectory export, ATE evaluation — on deterministic
synthetic sequences written in the exact on-disk formats:

  - TUM RGB-D: rgb/ + depth/ (16-bit, factor 5000) + rgb.txt + depth.txt +
    groundtruth.txt + TUM-style settings YAML (cv::FileStorage dialect);
  - KITTI stereo: image_0/ + image_1/ (true 8 cm baseline renders) +
    times.txt + poses_gt.txt + KITTI-style settings YAML.

Usage: python scripts/make_fixture_dataset.py <out_root> [--frames 120]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _quat_wxyz(R):
    """Rotation matrix -> quaternion (w, x, y, z), numpy."""
    t = np.trace(R)
    if t > 0:
        s = np.sqrt(t + 1.0) * 2
        return np.array([0.25 * s, (R[2, 1] - R[1, 2]) / s,
                         (R[0, 2] - R[2, 0]) / s, (R[1, 0] - R[0, 1]) / s])
    i = int(np.argmax(np.diag(R)))
    j, k = (i + 1) % 3, (i + 2) % 3
    s = np.sqrt(R[i, i] - R[j, j] - R[k, k] + 1.0) * 2
    q = np.zeros(4)
    q[0] = (R[k, j] - R[j, k]) / s
    q[1 + i] = 0.25 * s
    q[1 + j] = (R[j, i] + R[i, j]) / s
    q[1 + k] = (R[k, i] + R[i, k]) / s
    return q


def _save_png8(path, arr):
    from PIL import Image
    Image.fromarray(np.clip(arr, 0, 255).astype(np.uint8), mode="L").save(path)


def _save_png16(path, arr):
    from PIL import Image
    Image.fromarray(arr.astype(np.uint16), mode="I;16").save(path)


SETTINGS_TUM = """%YAML:1.0
Camera.fx: 500.0
Camera.fy: 500.0
Camera.cx: 320.0
Camera.cy: 240.0
Camera.k1: 0.0
Camera.k2: 0.0
Camera.p1: 0.0
Camera.p2: 0.0
Camera.k3: 0.0
Camera.width: 640
Camera.height: 480
Camera.fps: 30.0
Camera.bf: 40.0
Camera.RGB: 1
ThDepth: 40.0
DepthMapFactor: 5000.0
ORBextractor.nFeatures: 1000
ORBextractor.scaleFactor: 1.2
ORBextractor.nLevels: 8
ORBextractor.iniThFAST: 20
ORBextractor.minThFAST: 7
# engine extension: monocular-bootstrap gates tuned to the synthetic
# corner density (~200 level-0 corners; real imagery carries >400 and
# uses the reference-strength defaults)
Init.minFeatures: 150
Init.minMatches: 60
"""

SETTINGS_KITTI = """%YAML:1.0
Camera.fx: 500.0
Camera.fy: 500.0
Camera.cx: 320.0
Camera.cy: 240.0
Camera.k1: 0.0
Camera.k2: 0.0
Camera.p1: 0.0
Camera.p2: 0.0
Camera.width: 640
Camera.height: 480
Camera.fps: 10.0
Camera.bf: 40.0
Camera.RGB: 1
ThDepth: 35.0
ORBextractor.nFeatures: 1000
ORBextractor.scaleFactor: 1.2
ORBextractor.nLevels: 8
ORBextractor.iniThFAST: 20
ORBextractor.minThFAST: 7
"""


def make_tum_rgbd(out_dir, n_frames=120, seed=1, fps=30.0, laps=1,
                  style="orbit", cal_err=0.0):
    """laps > 1 makes the sequence REVISIT its start — the dataset-path
    trajectory that exercises loop closure. style="lookout" rides an
    outward-gazing circle in a CLOSED room (a genuine revisit: content
    leaves the view mid-lap, so covisibility to the start decays and the
    loop detector has real non-covisible candidates — the plain orbit
    stares at one wall and every keyframe stays covisible, VERDICT r4
    mono-loop diagnosis); style="orbit" is the original small arc."""
    from orb_slam2_with_comment_tpu.dataio.synthetic import (
        SyntheticWorld, lookout_trajectory, orbit_trajectory)
    if style == "lookout":
        world = SyntheticWorld(seed=seed, closed=True)
        poses = lookout_trajectory(n_frames=n_frames, laps=float(laps))
    else:
        world = SyntheticWorld(seed=seed)
        poses = orbit_trajectory(n_frames=max(n_frames // laps, 2)) * laps
        poses = poses[:n_frames]
    os.makedirs(os.path.join(out_dir, "rgb"), exist_ok=True)
    os.makedirs(os.path.join(out_dir, "depth"), exist_ok=True)
    rgb_lines, dep_lines, gt_lines = [], [], []
    for k, (R, t) in enumerate(poses):
        ts = k / fps
        img, depth = world.render(R, t)
        name = f"{ts:.6f}.png"
        _save_png8(os.path.join(out_dir, "rgb", name), img)
        d16 = np.clip(depth * 5000.0, 0, 65535)
        d16[depth <= 0] = 0  # invalid returns, TUM convention
        _save_png16(os.path.join(out_dir, "depth", name), d16)
        rgb_lines.append(f"{ts:.6f} rgb/{name}")
        dep_lines.append(f"{ts:.6f} depth/{name}")
        Rwc = np.asarray(R).T
        twc = -Rwc @ np.asarray(t)
        q = _quat_wxyz(Rwc)
        gt_lines.append(
            f"{ts:.6f} {twc[0]:.7f} {twc[1]:.7f} {twc[2]:.7f} "
            f"{q[1]:.7f} {q[2]:.7f} {q[3]:.7f} {q[0]:.7f}")
    hdr = "# timestamp filename\n"
    open(os.path.join(out_dir, "rgb.txt"), "w").write(
        hdr + "\n".join(rgb_lines) + "\n")
    open(os.path.join(out_dir, "depth.txt"), "w").write(
        hdr + "\n".join(dep_lines) + "\n")
    open(os.path.join(out_dir, "groundtruth.txt"), "w").write(
        "# ts tx ty tz qx qy qz qw\n" + "\n".join(gt_lines) + "\n")
    settings = SETTINGS_TUM
    if cal_err:
        # realistic imperfect calibration: the settings file's focal
        # length differs from the render camera's by cal_err. Every real
        # dataset carries such error; it is what makes tracking drift
        # ACCUMULATE and the revisit genuinely mismatch — on an exact-
        # calibration noise-free fixture, mono/RGB-D tracking re-matches
        # the old map through the local search on revisit and no loop
        # closure is ever NEEDED (the reference would report 0 loops on
        # such a sequence too)
        settings = settings.replace(
            "Camera.fx: 500.0", f"Camera.fx: {500.0 * (1 + cal_err):.2f}"
        ).replace(
            "Camera.fy: 500.0", f"Camera.fy: {500.0 * (1 + cal_err):.2f}")
    open(os.path.join(out_dir, "settings.yaml"), "w").write(settings)
    return out_dir


def make_kitti_stereo(out_dir, n_frames=100, seed=2, fps=10.0,
                      baseline=0.08):
    from orb_slam2_with_comment_tpu.dataio.synthetic import (
        SyntheticWorld, orbit_trajectory)
    world = SyntheticWorld(seed=seed)
    poses = orbit_trajectory(n_frames=n_frames)
    os.makedirs(os.path.join(out_dir, "image_0"), exist_ok=True)
    os.makedirs(os.path.join(out_dir, "image_1"), exist_ok=True)
    times, gt_rows = [], []
    off = np.array([baseline, 0, 0], np.float32)
    for k, (R, t) in enumerate(poses):
        left, _ = world.render(R, t)
        right, _ = world.render(np.asarray(R), np.asarray(t) - off)
        _save_png8(os.path.join(out_dir, "image_0", f"{k:06d}.png"), left)
        _save_png8(os.path.join(out_dir, "image_1", f"{k:06d}.png"), right)
        times.append(f"{k / fps:.6e}")
        Rwc = np.asarray(R).T
        twc = -Rwc @ np.asarray(t)
        gt_rows.append(" ".join(
            f"{v:.9e}" for v in np.hstack(
                [Rwc, twc[:, None]]).reshape(-1)))
    open(os.path.join(out_dir, "times.txt"), "w").write("\n".join(times) + "\n")
    open(os.path.join(out_dir, "poses_gt.txt"), "w").write(
        "\n".join(gt_rows) + "\n")
    open(os.path.join(out_dir, "settings.yaml"), "w").write(SETTINGS_KITTI)
    return out_dir


SETTINGS_KITTI_REAL = """%YAML:1.0
Camera.fx: 718.856
Camera.fy: 718.856
Camera.cx: 607.1928
Camera.cy: 185.2157
Camera.k1: 0.0
Camera.k2: 0.0
Camera.p1: 0.0
Camera.p2: 0.0
Camera.width: 1241
Camera.height: 376
Camera.fps: 10.0
Camera.bf: 386.1448
Camera.RGB: 1
ThDepth: 35.0
ORBextractor.nFeatures: 2000
ORBextractor.scaleFactor: 1.2
ORBextractor.nLevels: 8
ORBextractor.iniThFAST: 20
ORBextractor.minThFAST: 7
"""


def make_kitti_street(out_dir, n_frames=500, seed=3, fps=10.0):
    """Street-scale KITTI-format stereo sequence (VERDICT r4 #6): a
    ~60 m city-block circuit at the REAL KITTI 00-02 camera geometry
    (1241x376, fx=718.856, bf=386.1448 -> 53.7 cm baseline,
    reference Examples/Stereo/KITTI00-02.yaml), driven slightly past one
    full lap so the sequence revisits its start."""
    from orb_slam2_with_comment_tpu.dataio.synthetic import (
        StreetWorld, street_trajectory)
    world = StreetWorld(seed=seed)
    poses = street_trajectory(world, n_frames, laps=1.08)
    os.makedirs(os.path.join(out_dir, "image_0"), exist_ok=True)
    os.makedirs(os.path.join(out_dir, "image_1"), exist_ok=True)
    KFX, KCX, KCY, KBF = 718.856, 607.1928, 185.2157, 386.1448
    cam = dict(fx=KFX, fy=KFX, cx=KCX, cy=KCY, width=1241, height=376)
    times, gt_rows = [], []
    for k, (R, t) in enumerate(poses):
        # stereo right camera: t' = t - [b, 0, 0] displaces the center
        # along the camera x axis for ANY R (t is in camera coords)
        left, _ = world.render(R, t, **cam)
        right, _ = world.render(
            np.asarray(R), np.asarray(t) - np.array(
                [KBF / KFX, 0, 0], np.float32), **cam)
        _save_png8(os.path.join(out_dir, "image_0", f"{k:06d}.png"), left)
        _save_png8(os.path.join(out_dir, "image_1", f"{k:06d}.png"), right)
        times.append(f"{k / fps:.6e}")
        Rwc = np.asarray(R).T
        twc = -Rwc @ np.asarray(t)
        gt_rows.append(" ".join(
            f"{v:.9e}" for v in np.hstack(
                [Rwc, twc[:, None]]).reshape(-1)))
    open(os.path.join(out_dir, "times.txt"), "w").write(
        "\n".join(times) + "\n")
    open(os.path.join(out_dir, "poses_gt.txt"), "w").write(
        "\n".join(gt_rows) + "\n")
    open(os.path.join(out_dir, "settings.yaml"), "w").write(
        SETTINGS_KITTI_REAL)
    return out_dir


SETTINGS_EUROC = """%YAML:1.0
Camera.fx: 500.0
Camera.fy: 500.0
Camera.cx: 320.0
Camera.cy: 240.0
Camera.k1: 0.0
Camera.k2: 0.0
Camera.p1: 0.0
Camera.p2: 0.0
Camera.width: 640
Camera.height: 480
Camera.fps: 20.0
Camera.bf: 40.0
Camera.RGB: 1
ThDepth: 35.0
ORBextractor.nFeatures: 1000
ORBextractor.scaleFactor: 1.2
ORBextractor.nLevels: 8
ORBextractor.iniThFAST: 20
ORBextractor.minThFAST: 7
LEFT.width: 640
LEFT.height: 480
LEFT.K: !!opencv-matrix
   rows: 3
   cols: 3
   dt: d
   data: [500.0, 0.0, 320.0, 0.0, 500.0, 240.0, 0.0, 0.0, 1.0]
LEFT.D: !!opencv-matrix
   rows: 1
   cols: 5
   dt: d
   data: [-0.20, 0.05, 0.0, 0.0, 0.0]
LEFT.R: !!opencv-matrix
   rows: 3
   cols: 3
   dt: d
   data: [1.0, 0.0, 0.0, 0.0, 1.0, 0.0, 0.0, 0.0, 1.0]
LEFT.P: !!opencv-matrix
   rows: 3
   cols: 4
   dt: d
   data: [500.0, 0.0, 320.0, 0.0, 0.0, 500.0, 240.0, 0.0, 0.0, 0.0, 1.0, 0.0]
RIGHT.width: 640
RIGHT.height: 480
RIGHT.K: !!opencv-matrix
   rows: 3
   cols: 3
   dt: d
   data: [500.0, 0.0, 320.0, 0.0, 500.0, 240.0, 0.0, 0.0, 1.0]
RIGHT.D: !!opencv-matrix
   rows: 1
   cols: 5
   dt: d
   data: [-0.20, 0.05, 0.0, 0.0, 0.0]
RIGHT.R: !!opencv-matrix
   rows: 3
   cols: 3
   dt: d
   data: [1.0, 0.0, 0.0, 0.0, 1.0, 0.0, 0.0, 0.0, 1.0]
RIGHT.P: !!opencv-matrix
   rows: 3
   cols: 4
   dt: d
   data: [500.0, 0.0, 320.0, 0.0, 0.0, 500.0, 240.0, 0.0, 0.0, 0.0, 1.0, 0.0]
"""


def _undistorted_dirs(width, height, fx, fy, cx, cy, D):
    """Per-RAW-pixel camera-frame ray directions for a radtan camera:
    invert the distortion by fixed-point iteration (the cv::undistortPoints
    scheme) so that distort(dirs.xy) lands back on the pixel grid."""
    k1, k2, p1, p2, k3 = [float(v) for v in D]
    u, v = np.meshgrid(np.arange(width, dtype=np.float64),
                       np.arange(height, dtype=np.float64))
    xd = (u - cx) / fx
    yd = (v - cy) / fy
    x, y = xd.copy(), yd.copy()
    for _ in range(8):
        r2 = x * x + y * y
        radial = 1 + k1 * r2 + k2 * r2 * r2 + k3 * r2 ** 3
        dx = 2 * p1 * x * y + p2 * (r2 + 2 * x * x)
        dy = p1 * (r2 + 2 * y * y) + 2 * p2 * x * y
        x = (xd - dx) / radial
        y = (yd - dy) / radial
    return np.stack([x, y, np.ones_like(x)], axis=-1).astype(np.float32)


def make_euroc_stereo(out_dir, n_frames=100, seed=3, fps=20.0,
                      baseline=0.08):
    """EuRoC on-disk layout (mav0/cam0/data/<ns>.png + cam1 + timestamp
    file) with RAW DISTORTED images (radtan k1=-0.2, k2=0.05): the driver
    must rectify online through the YAML LEFT./RIGHT. blocks exactly like
    the reference (stereo_euroc.cc:97-137). Ground truth is written
    TUM-style for the eval harness."""
    from orb_slam2_with_comment_tpu.dataio.synthetic import (
        SyntheticWorld, orbit_trajectory)
    world = SyntheticWorld(seed=seed)
    poses = orbit_trajectory(n_frames=n_frames)
    cam0 = os.path.join(out_dir, "mav0", "cam0", "data")
    cam1 = os.path.join(out_dir, "mav0", "cam1", "data")
    os.makedirs(cam0, exist_ok=True)
    os.makedirs(cam1, exist_ok=True)
    D = [-0.20, 0.05, 0.0, 0.0, 0.0]
    dirs = _undistorted_dirs(640, 480, 500.0, 500.0, 320.0, 240.0, D)
    off = np.array([baseline, 0, 0], np.float32)
    stamps, gt_lines = [], []
    for k, (R, t) in enumerate(poses):
        ns = int(round((k / fps) * 1e9))
        name = f"{ns}"
        left, _ = world.render(R, t, dirs=dirs)
        right, _ = world.render(np.asarray(R), np.asarray(t) - off,
                                dirs=dirs)
        _save_png8(os.path.join(cam0, name + ".png"), left)
        _save_png8(os.path.join(cam1, name + ".png"), right)
        stamps.append(name)
        Rwc = np.asarray(R).T
        twc = -Rwc @ np.asarray(t)
        q = _quat_wxyz(Rwc)
        gt_lines.append(
            f"{ns / 1e9:.6f} {twc[0]:.7f} {twc[1]:.7f} {twc[2]:.7f} "
            f"{q[1]:.7f} {q[2]:.7f} {q[3]:.7f} {q[0]:.7f}")
    open(os.path.join(out_dir, "timestamps.txt"), "w").write(
        "\n".join(stamps) + "\n")
    open(os.path.join(out_dir, "groundtruth_tum.txt"), "w").write(
        "# ts tx ty tz qx qy qz qw\n" + "\n".join(gt_lines) + "\n")
    open(os.path.join(out_dir, "settings.yaml"), "w").write(SETTINGS_EUROC)
    return out_dir


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("out_root")
    ap.add_argument("--frames", type=int, default=120)
    ap.add_argument("--street", action="store_true",
                    help="also render the street-scale KITTI-geometry "
                         "circuit (kitti_street_fixture, ~60 m lap)")
    ap.add_argument("--street-frames", type=int, default=500)
    args = ap.parse_args()
    if args.street:
        out = make_kitti_street(
            os.path.join(args.out_root, "kitti_street_fixture"),
            n_frames=args.street_frames)
        print("wrote", out)
    tum = make_tum_rgbd(os.path.join(args.out_root, "tum_fixture"),
                        n_frames=args.frames)
    loop = make_tum_rgbd(os.path.join(args.out_root, "tum_loop_fixture"),
                         n_frames=args.frames, laps=2, style="lookout",
                         cal_err=0.015)
    kitti = make_kitti_stereo(os.path.join(args.out_root, "kitti_fixture"),
                              n_frames=max(args.frames * 5 // 6, 20))
    euroc = make_euroc_stereo(os.path.join(args.out_root, "euroc_fixture"),
                              n_frames=max(args.frames * 2 // 3, 20))
    print("wrote", tum)
    print("wrote", loop)
    print("wrote", kitti)
    print("wrote", euroc)


if __name__ == "__main__":
    main()
