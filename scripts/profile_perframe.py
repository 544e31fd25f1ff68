"""Per-frame wall time of the from-scratch map-building pass (batch=1),
with keyframe/loop events from the stats, to locate the slow frames."""
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

LOOP = os.environ.get("LOOP", "1") == "1"


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

    auto_cfg = AutoTrackerConfig(traj_capacity=8 * n_frames, batch_frames=1,
                                 loop_closing=LOOP)
    tr = AutoTracker(cfg, auto_cfg)
    for img, depth in frames:
        tr.process_rgbd(img, depth)
    tr.sync()

    tr2 = AutoTracker(cfg, auto_cfg)
    times = []
    t_all = time.perf_counter()
    for img, depth in frames:
        t0 = time.perf_counter()
        tr2.process_rgbd(img, depth)
        jax.block_until_ready(tr2.state.frame_idx)
        times.append(time.perf_counter() - t0)
    total = time.perf_counter() - t_all
    out = tr2.finalize()
    kf_flags = out["stats"][:, 6]  # 1 = init/insert marker? stats8[6]
    ins = out["stats"][:, 6]
    print(f"total {total:.2f}s = {n_frames / total:.1f} fps "
          f"(per-frame sync mode), kf={out['n_keyframes']}")
    for i, dt in enumerate(times):
        tag = ""
        if out["stats"][i, 6] == 1 and i < 2:
            tag = " INIT"
        elif out["stats"][i, 6] == 1:
            tag = " KF"
        print(f"frame {i:3d}  {1e3 * dt:8.1f} ms  stats6={int(ins[i])}"
              f" loops={int(out['stats'][i, 7])}{tag}")


if __name__ == "__main__":
    main()
