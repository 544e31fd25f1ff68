#!/usr/bin/env python
"""Run the dataset drivers end-to-end on the deterministic fixtures and
write RESULTS.md with measured ATE (the real TUM/KITTI/EuRoC archives are
unreachable from this environment — the attempt is documented in
RESULTS.md; the fixtures exercise the identical on-disk formats and code
path: PNG decode -> loaders -> System driver -> trajectory export -> ATE).

Usage:
  python scripts/run_fixture_eval.py [--root /tmp/fixtures] [--frames 120]
"""
import argparse
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# The axon TPU tunnel is EXCLUSIVE per process: if this parent imported
# jax against the tunnel (the package __init__ imports jax), the driver
# subprocesses below would block at their own jax import. The parent
# pins itself to CPU and hands the ORIGINAL (TPU) environment to the
# subprocesses, which run serially.
TPU_ENV = dict(os.environ)
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["PALLAS_AXON_POOL_IPS"] = ""

import numpy as np


def _quat_to_R(qx, qy, qz, qw):
    x, y, z, w = qx, qy, qz, qw
    return np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - z * w), 2 * (x * z + y * w)],
        [2 * (x * y + z * w), 1 - 2 * (x * x + z * z), 2 * (y * z - x * w)],
        [2 * (x * z - y * w), 2 * (y * z + x * w), 1 - 2 * (x * x + y * y)],
    ])


def read_tum(path):
    """TUM trajectory file -> (ts [N], centers [N,3]) (poses are
    camera-to-world; the camera center IS the translation column)."""
    ts, cs = [], []
    for ln in open(path):
        ln = ln.strip()
        if not ln or ln.startswith("#"):
            continue
        v = [float(x) for x in ln.split()]
        ts.append(v[0])
        cs.append(v[1:4])
    return np.asarray(ts), np.asarray(cs)


def read_kitti(path):
    rows = [[float(x) for x in ln.split()] for ln in open(path)
            if ln.strip()]
    P = np.asarray(rows).reshape(-1, 3, 4)
    return P[:, :, 3]  # camera centers (camera-to-world translation)


def associate(ts_a, ts_b, max_diff=0.02):
    ib = np.searchsorted(ts_b, ts_a)
    out = []
    for i, t in enumerate(ts_a):
        best, bd = -1, max_diff
        for j in (ib[i] - 1, ib[i]):
            if 0 <= j < len(ts_b) and abs(ts_b[j] - t) <= bd:
                best, bd = j, abs(ts_b[j] - t)
        if best >= 0:
            out.append((i, best))
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="/tmp/fixtures")
    ap.add_argument("--frames", type=int, default=120)
    ap.add_argument("--skip-gen", action="store_true")
    args = ap.parse_args()
    env = TPU_ENV
    results = {}

    if not args.skip_gen:
        subprocess.run([sys.executable,
                        os.path.join(REPO, "scripts/make_fixture_dataset.py"),
                        args.root, "--frames", str(args.frames)], check=True)

    from orb_slam2_with_comment_tpu.evaluation.ate import ate_rmse

    # --- TUM RGB-D driver ---
    tum = os.path.join(args.root, "tum_fixture")
    wd = os.path.join(args.root, "run_tum")
    os.makedirs(wd, exist_ok=True)
    subprocess.run([sys.executable, os.path.join(REPO, "examples/rgbd_tum.py"),
                    os.path.join(tum, "settings.yaml"), tum],
                   cwd=wd, env=env, check=True)
    ts_e, c_e = read_tum(os.path.join(wd, "CameraTrajectory.txt"))
    ts_g, c_g = read_tum(os.path.join(tum, "groundtruth.txt"))
    pairs = associate(ts_e, ts_g)
    ia = [p[0] for p in pairs]
    ib = [p[1] for p in pairs]
    results["tum_rgbd"] = {
        "frames": args.frames, "tracked": len(ts_e),
        "ate_rmse_m": float(ate_rmse(c_e[ia], c_g[ib]))}

    # --- KITTI stereo driver ---
    kitti = os.path.join(args.root, "kitti_fixture")
    wd = os.path.join(args.root, "run_kitti")
    os.makedirs(wd, exist_ok=True)
    subprocess.run([sys.executable,
                    os.path.join(REPO, "examples/stereo_kitti.py"),
                    os.path.join(kitti, "settings.yaml"), kitti],
                   cwd=wd, env=env, check=True)
    c_e = read_kitti(os.path.join(wd, "CameraTrajectory.txt"))
    c_g = read_kitti(os.path.join(kitti, "poses_gt.txt"))
    n = min(len(c_e), len(c_g))
    results["kitti_stereo"] = {
        "frames": len(c_g), "tracked": len(c_e),
        "ate_rmse_m": float(ate_rmse(c_e[:n], c_g[:n]))}

    # --- mono TUM driver (scale-aligned ATE) ---
    wd = os.path.join(args.root, "run_mono")
    os.makedirs(wd, exist_ok=True)
    subprocess.run([sys.executable, os.path.join(REPO, "examples/mono_tum.py"),
                    os.path.join(tum, "settings.yaml"), tum],
                   cwd=wd, env=env, check=True)
    ts_e, c_e = read_tum(os.path.join(wd, "KeyFrameTrajectory.txt"))
    ts_g, c_g = read_tum(os.path.join(tum, "groundtruth.txt"))
    pairs = associate(ts_e, ts_g)
    ia = [p[0] for p in pairs]
    ib = [p[1] for p in pairs]
    results["tum_mono"] = {
        "frames": args.frames, "keyframes": len(ts_e),
        "ate_rmse_m_scaled": float(ate_rmse(c_e[ia], c_g[ib],
                                            with_scale=True))}

    lines = [
        "# RESULTS — dataset-path end-to-end runs",
        "",
        "## Real benchmark datasets: download attempt (documented)",
        "",
        "This environment has **zero network egress**: "
        "`curl https://vision.in.tum.de/...` returns HTTP code 000 "
        "(connection impossible), and no dataset archives exist anywhere "
        "on disk (`/root`, `/data`, `/mnt`, `/srv` checked). The paper "
        "targets in BASELINE.md therefore cannot be re-measured here; "
        "what CAN be validated offline is the complete real-dataset code "
        "path, which the fixtures below drive bit-for-bit: 8/16-bit PNG "
        "decode, TUM/KITTI list+association parsing, cv::FileStorage YAML "
        "settings, the System drivers, trajectory export in the exact "
        "reference formats (System.cc:336-486 semantics), and the in-repo "
        "ATE evaluator.",
        "",
        "## Fixture runs (deterministic synthetic sequences, real formats)",
        "",
        "| run | frames | tracked/KFs | ATE RMSE |",
        "|---|---|---|---|",
    ]
    r = results["tum_rgbd"]
    lines.append(f"| TUM-format RGB-D (examples/rgbd_tum.py) | {r['frames']} "
                 f"| {r['tracked']} | {r['ate_rmse_m']*100:.1f} cm |")
    r = results["kitti_stereo"]
    lines.append(f"| KITTI-format stereo (examples/stereo_kitti.py) | "
                 f"{r['frames']} | {r['tracked']} | "
                 f"{r['ate_rmse_m']*100:.1f} cm |")
    r = results["tum_mono"]
    lines.append(f"| TUM-format mono (examples/mono_tum.py, Sim3-aligned) | "
                 f"{r['frames']} | {r['keyframes']} KFs | "
                 f"{r['ate_rmse_m_scaled']*100:.1f} cm |")
    lines += [
        "",
        "Fixtures: `scripts/make_fixture_dataset.py` (640x480, textured-room "
        "ray-cast orbit, ~1.2 m trajectory span, true 8 cm stereo baseline, "
        "16-bit depth at DepthMapFactor 5000). Regenerate + re-measure with "
        "`python scripts/run_fixture_eval.py`.",
        "",
    ]
    with open(os.path.join(REPO, "RESULTS.md"), "w") as f:
        f.write("\n".join(lines))
    print("\n".join(lines))


if __name__ == "__main__":
    main()
