"""Compare from-scratch map-building wall time across dispatch modes:
batch_frames=1 vs 4, loop closing on/off — single sync at the end
(streaming mode, no readbacks), after a warmup pass compiles everything."""
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

    for batch in (1, 4):
        for loop in (True, False):
            ac = AutoTrackerConfig(traj_capacity=8 * n_frames,
                                   batch_frames=batch, loop_closing=loop)
            tr = AutoTracker(cfg, ac)
            for img, depth in frames:
                tr.process_rgbd(img, depth)
            tr.sync()
            best = None
            for _ in range(2):
                tr2 = AutoTracker(cfg, ac)
                t0 = time.perf_counter()
                for img, depth in frames:
                    tr2.process_rgbd(img, depth)
                tr2.sync()
                dt = time.perf_counter() - t0
                best = dt if best is None else min(best, dt)
            print(f"batch={batch} loop={int(loop)}: {best:.2f}s "
                  f"= {n_frames / best:.1f} fps", flush=True)


if __name__ == "__main__":
    main()
