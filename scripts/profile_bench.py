"""Per-frame timing breakdown of the bench workload on the current backend.

Splits steady-state frame time into: upload wait (host->device transfer not
yet done), step dispatch (process_rgbd body incl. any forced finalizes), and
background-finalize stats-wait, to show whether the tunnel bandwidth, the
device compute, or the readback RTT bounds throughput.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

from orb_slam2_with_comment_tpu.runtime import AsyncUploader, enable_compilation_cache

enable_compilation_cache()

from orb_slam2_with_comment_tpu.dataio.synthetic import SyntheticWorld, orbit_trajectory
from orb_slam2_with_comment_tpu.mapstate.map import MapConfig
from orb_slam2_with_comment_tpu.pipeline import Tracker, TrackerConfig

n_frames = int(os.environ.get("BENCH_FRAMES", "60"))
world = SyntheticWorld(seed=1)
poses = orbit_trajectory(n_frames=n_frames)
cfg = TrackerConfig(
    n_features=1000, min_init_features=200,
    map_cfg=MapConfig(k_max=24, n_feat=1000, l_max=8000, d_max=8), fps=30,
    depth_factor=1.0 / 5000.0)
frames = [(np.clip(img, 0, 255).astype(np.uint8),
           np.clip(depth * 5000.0, 0, 65535).astype(np.uint16))
          for img, depth in (world.render(R, t) for R, t in poses)]

tracker = Tracker(cfg)
uploader = AsyncUploader()


def run_pass(start):
    up_w, disp, depths = [], [], []
    fut = uploader.put(*frames[0])
    for k in range(len(frames)):
        t0 = time.perf_counter()
        img, depth = fut.result()
        t1 = time.perf_counter()
        if k + 1 < len(frames):
            fut = uploader.put(*frames[k + 1])
        tracker.process_rgbd(img, depth, frame_id=start + k)
        t2 = time.perf_counter()
        up_w.append(t1 - t0)
        disp.append(t2 - t1)
        depths.append(len(tracker._pending))
    return np.array(up_w), np.array(disp), depths


run_pass(0)
for p in (1, 2):
    t0 = time.perf_counter()
    up, disp, depths = run_pass(p * n_frames)
    dt = time.perf_counter() - t0
    print("pass%d: fps=%.2f  frame=%.1fms" % (p, n_frames / dt, dt / n_frames * 1e3))
    print("  upload wait: median=%.1fms mean=%.1fms sum=%.2fs" % (
        np.median(up) * 1e3, up.mean() * 1e3, up.sum()))
    print("  dispatch:    median=%.1fms mean=%.1fms p90=%.1fms max=%.1fms sum=%.2fs" % (
        np.median(disp) * 1e3, disp.mean() * 1e3,
        np.percentile(disp, 90) * 1e3, disp.max() * 1e3, disp.sum()))
    print("  pending depth: median=%d max=%d" % (
        int(np.median(depths)), max(depths)))
print("backend:", jax.default_backend(), " n_kf:", tracker.n_kf_host)
