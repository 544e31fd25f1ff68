"""Instrumented dispatch-mode probe: per-frame dispatch wall time WITHOUT
syncs, printed live, to find where the no-sync loop stalls."""
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

BATCH = int(os.environ.get("BATCH", "1"))
LOOP = os.environ.get("LOOP", "1") == "1"


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


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
    log("frames rendered")
    tr = AutoTracker(cfg, AutoTrackerConfig(
        traj_capacity=8 * n_frames, batch_frames=BATCH, loop_closing=LOOP))
    log("tracker built")
    t_all = time.perf_counter()
    for i, (img, depth) in enumerate(frames):
        t0 = time.perf_counter()
        tr.process_rgbd(img, depth)
        dt = time.perf_counter() - t0
        if dt > 0.2 or i < 3 or i % 10 == 0:
            log(f"warmup frame {i}: dispatch {1e3 * dt:.0f} ms")
    log("warmup dispatched; syncing...")
    tr.sync()
    log(f"warmup done in {time.perf_counter() - t_all:.1f}s")

    for p in range(2):
        tr2 = AutoTracker(cfg, AutoTrackerConfig(
            traj_capacity=8 * n_frames, batch_frames=BATCH,
            loop_closing=LOOP))
        log(f"pass {p}: tracker built")
        t0 = time.perf_counter()
        slow = 0
        for i, (img, depth) in enumerate(frames):
            t1 = time.perf_counter()
            tr2.process_rgbd(img, depth)
            if time.perf_counter() - t1 > 0.2:
                slow += 1
        tr2.sync()
        dt = time.perf_counter() - t0
        log(f"pass {p}: {dt:.2f}s = {n_frames / dt:.1f} fps "
            f"({slow} slow dispatches)")


if __name__ == "__main__":
    main()
