"""Per-frame timing breakdown of the bench workload on the current backend."""
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
    map_cfg=MapConfig(k_max=24, n_feat=1000, l_max=8000, d_max=8), fps=30)
frames = [world.render(R, t) for R, t in poses]

tracker = Tracker(cfg)
uploader = AsyncUploader()


def run_pass(start):
    times = []
    kf_before = []
    depths = []
    fut = uploader.put(*frames[0])
    for k in range(len(frames)):
        img, depth = fut.result()
        if k + 1 < len(frames):
            fut = uploader.put(*frames[k + 1])
        kf_before.append(tracker.n_kf_host)
        t0 = time.perf_counter()
        tracker.process_rgbd(img, depth, frame_id=start + k)
        times.append(time.perf_counter() - t0)
        depths.append(len(tracker._pending))
    return np.array(times), kf_before


run_pass(0)
t, kfb = run_pass(n_frames)
print("backend:", jax.default_backend())
print("total: %.3fs  fps=%.2f" % (t.sum(), len(t) / t.sum()))
print("median=%.1fms mean=%.1fms p90=%.1fms max=%.1fms" % (
    np.median(t) * 1e3, t.mean() * 1e3, np.percentile(t, 90) * 1e3, t.max() * 1e3))
kf_events = [i for i in range(1, len(kfb)) if kfb[i] != kfb[i - 1]]
print("kf events at frames:", kf_events, " n_kf:", tracker.n_kf_host)
slow = np.argsort(t)[-10:][::-1]
print("slowest frames:", [(int(i), round(t[i] * 1e3, 1)) for i in slow])

# instrument sections
import orb_slam2_with_comment_tpu.pipeline.tracking as T
orig_fin = T.Tracker._finalize
fin_t = []
def fin(self, res, frame_id, fut=None):
    t0 = time.perf_counter()
    wait = 0.0
    if fut is not None:
        tw = time.perf_counter(); fut.result(); wait = time.perf_counter() - tw
    r = orig_fin(self, res, frame_id, fut)
    fin_t.append((frame_id, wait, time.perf_counter() - t0))
    return r
T.Tracker._finalize = fin
t2, _ = run_pass(2 * n_frames)
print("pass3 fps=%.2f median=%.1fms mean=%.1fms" % (len(t2)/t2.sum(), np.median(t2)*1e3, t2.mean()*1e3))
w = np.array([x[1] for x in fin_t]); tot = np.array([x[2] for x in fin_t])
print("finalize: n=%d wait median=%.1fms mean=%.1fms; total median=%.1fms mean=%.1fms sum=%.2fs" % (
    len(fin_t), np.median(w)*1e3, w.mean()*1e3, np.median(tot)*1e3, tot.mean()*1e3, tot.sum()))
big = sorted(fin_t, key=lambda x: -x[2])[:8]
print("slowest finalizes:", [(f, round(wv*1e3,1), round(tv*1e3,1)) for f, wv, tv in big])

