"""Headline benchmark: RGB-D tracking throughput on real hardware.

Runs the full tracking pipeline (ORB extraction -> matching -> pose
optimization -> keyframe/local-mapping decisions) over a synthetic RGB-D
sequence and reports tracked frames/s. Baseline: the reference's published
real-time rate of ~30 fps on an i7 CPU (reference README.md:59, TRO'17
timing tables; BASELINE.md).

Prints ONE JSON line:
  {"metric": "tracking_fps", "value": N, "unit": "frames/s", "vs_baseline": N/30}
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from orb_slam2_with_comment_tpu.dataio.synthetic import (  # noqa: E402
    SyntheticWorld, orbit_trajectory)
from orb_slam2_with_comment_tpu.mapstate.map import MapConfig  # noqa: E402
from orb_slam2_with_comment_tpu.pipeline import Tracker, TrackerConfig  # noqa: E402

BASELINE_FPS = 30.0


def main():
    n_frames = int(os.environ.get("BENCH_FRAMES", "60"))
    world = SyntheticWorld(seed=1)
    poses = orbit_trajectory(n_frames=n_frames)
    cfg = TrackerConfig(
        n_features=1000,
        min_init_features=200,
        map_cfg=MapConfig(k_max=24, n_feat=1000, l_max=8000, d_max=8),
        fps=30,
    )
    # Pre-render all frames (dataset IO is not part of the measured loop).
    frames = [world.render(R, t) for R, t in poses]

    tracker = Tracker(cfg)
    # Warmup: first frames compile the jitted steps.
    warm = min(6, n_frames // 3)
    for k in range(warm):
        tracker.process_rgbd(frames[k][0], frames[k][1], frame_id=k)

    t0 = time.perf_counter()
    tracked = 0
    for k in range(warm, n_frames):
        out = tracker.process_rgbd(frames[k][0], frames[k][1], frame_id=k)
        tracked += out is not None
    dt = time.perf_counter() - t0
    fps = (n_frames - warm) / dt
    print(json.dumps({
        "metric": "tracking_fps",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / BASELINE_FPS, 3),
    }))


if __name__ == "__main__":
    main()
