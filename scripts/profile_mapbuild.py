"""Break down the map-building pass cost: loop closing vs keyframe
maintenance vs transport degradation.

All timed passes run BEFORE any device->host readback (streaming-mode
transport), mirroring how a production driver runs.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

from orb_slam2_with_comment_tpu.runtime import enable_compilation_cache

enable_compilation_cache()

from orb_slam2_with_comment_tpu.dataio.synthetic import (
    SyntheticWorld, orbit_trajectory)
from orb_slam2_with_comment_tpu.mapstate.map import MapConfig
from orb_slam2_with_comment_tpu.pipeline import (
    AutoTracker, AutoTrackerConfig, TrackerConfig)


def main():
    n_frames = int(os.environ.get("BENCH_FRAMES", "60"))
    world = SyntheticWorld(seed=1)
    poses = orbit_trajectory(n_frames=n_frames)
    cfg = TrackerConfig(
        n_features=1000, min_init_features=200,
        map_cfg=MapConfig(k_max=24, n_feat=1000, l_max=8000, d_max=8),
        fps=30, depth_factor=1.0 / 5000.0)
    frames = [(np.clip(img, 0, 255).astype(np.uint8),
               np.clip(depth * 5000.0, 0, 65535).astype(np.uint16))
              for img, depth in (world.render(R, t) for R, t in poses)]

    results = {}

    def run_pass(label, loop_closing, n_passes=1):
        tr = AutoTracker(cfg, AutoTrackerConfig(
            traj_capacity=8 * n_frames, batch_frames=4,
            loop_closing=loop_closing))
        # compile warmup
        for img, depth in frames:
            tr.process_rgbd(img, depth)
        tr.sync()
        # timed from-scratch passes with fresh trackers (cached compiles)
        for p in range(n_passes):
            tr2 = AutoTracker(cfg, AutoTrackerConfig(
                traj_capacity=8 * n_frames, batch_frames=4,
                loop_closing=loop_closing))
            t0 = time.perf_counter()
            for img, depth in frames:
                tr2.process_rgbd(img, depth)
            tr2.sync()
            dt = time.perf_counter() - t0
            results[f"{label}_p{p}"] = (n_frames / dt, dt)
        return tr2

    tr_noloop = run_pass("build_noloop", loop_closing=False, n_passes=2)
    tr_loop = run_pass("build_loop", loop_closing=True, n_passes=2)

    for k, (fps, dt) in results.items():
        print(f"{k:24s} {fps:7.1f} fps  ({dt:.2f} s)")

    out = tr_loop.finalize()
    print("loop run: kf =", out["n_keyframes"], "loops =",
          out["n_loops_closed"], "lost_at =", out["lost_at"])
    out2 = tr_noloop.finalize()
    print("noloop run: kf =", out2["n_keyframes"], "lost_at =",
          out2["lost_at"])


if __name__ == "__main__":
    main()
