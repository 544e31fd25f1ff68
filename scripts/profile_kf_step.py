"""Profile the keyframe-maintenance step components on real hardware.

Builds a representative mid-run map via the AutoTracker warmup, then times
each keyframe_step sub-stage in isolation (median of repeats, with
block_until_ready) to locate where the map-building budget goes.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from orb_slam2_with_comment_tpu.runtime import enable_compilation_cache

enable_compilation_cache()

from orb_slam2_with_comment_tpu.dataio.synthetic import (
    SyntheticWorld, orbit_trajectory)
from orb_slam2_with_comment_tpu.mapstate.map import MapConfig, covisibility_weights
from orb_slam2_with_comment_tpu.pipeline import (
    AutoTracker, AutoTrackerConfig, TrackerConfig)
from orb_slam2_with_comment_tpu.pipeline import steps
from orb_slam2_with_comment_tpu.ops import prims


def _copy(x):
    return jax.tree.map(jnp.copy, x)


def timed(label, fn, *args, n=8, copy_first=True, **kw):
    """Time fn(*args); if copy_first, the first arg (a donated pytree) is
    deep-copied per call so donation doesn't consume the caller's copy.
    The copy is timed separately and subtracted."""
    def call():
        if copy_first:
            a0 = _copy(args[0])
            jax.block_until_ready(a0)
            t0 = time.perf_counter()
            out = fn(a0, *args[1:], **kw)
        else:
            t0 = time.perf_counter()
            out = fn(*args, **kw)
        jax.block_until_ready(out)
        return time.perf_counter() - t0, out

    _, out = call()  # compile
    ts = []
    for _ in range(n):
        dt, out = call()
        ts.append(dt)
    print(f"{label:34s} {1e3 * float(np.median(ts)):8.2f} ms")
    return out


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

    tracker = AutoTracker(cfg, AutoTrackerConfig(
        traj_capacity=8 * n_frames, batch_frames=4))
    t0 = time.perf_counter()
    for img, depth in frames:
        tracker.process_rgbd(img, depth)
    tracker.sync()
    print(f"warmup pass (compile): {time.perf_counter() - t0:.1f} s")

    # timed from-scratch pass = the map-building figure
    tracker2 = AutoTracker(cfg, AutoTrackerConfig(
        traj_capacity=8 * n_frames, batch_frames=4))
    t0 = time.perf_counter()
    for img, depth in frames:
        tracker2.process_rgbd(img, depth)
    tracker2.sync()
    dt = time.perf_counter() - t0
    out2 = tracker2.finalize()
    n_kf = out2["n_keyframes"]
    print(f"map-building pass: {dt:.2f}s = {n_frames / dt:.1f} fps, "
          f"{n_kf} keyframes -> {1e3 * dt / n_frames:.1f} ms/frame avg")

    # per-stage timing on the final map
    m = tracker.state.map
    cam = cfg.cam
    k = m.n_kf - 1
    obs = steps.FrameObs(tracker.state.prev.feats, tracker.state.prev.depth,
                         tracker.state.prev.lm)
    W, H = cfg.width, cfg.height
    th_depth = jnp.float32(cfg.depth_threshold)

    def full_kf_step(m):
        return steps.keyframe_step(m, cam, obs, m.kf_R[k], m.kf_t[k],
                                   jnp.int32(999), th_depth, W, H)

    timed("keyframe_step (full)", full_kf_step, m)

    m1 = timed("insert_keyframe", steps.insert_keyframe, m, cam, obs,
               m.kf_R[k], m.kf_t[k], jnp.int32(999))

    @jax.jit
    def covis(m):
        w = covisibility_weights(m, k)
        return prims.sort_top_k(w, 10)

    (top_w, top_i) = timed("covis weights+top10", covis, m1)
    cull_window = jnp.where(top_w > 0, top_i.astype(jnp.int32), -1)
    neighbors = cull_window[:5]

    m2 = timed("fuse_neighbors into", steps.fuse_neighbors, m1, cam, k,
               neighbors, W, H, into=True)
    m3 = timed("create_depth_landmarks", steps.create_depth_landmarks,
               m2, cam, k, th_depth)
    m4 = timed("fuse_neighbors out", steps.fuse_neighbors, m3, cam, k,
               neighbors, W, H, into=False)
    m5 = timed("merge_duplicate_landmarks", steps.merge_duplicate_landmarks,
               m4, k)
    m6 = timed("refresh_landmarks_for_kf", steps.refresh_landmarks_for_kf,
               m5, k)
    m7 = timed("cull_landmarks", steps.cull_landmarks, m6, k)
    m8 = timed("local_bundle_adjustment", steps.local_bundle_adjustment,
               m7, cam, k)
    timed("cull_keyframes", steps.cull_keyframes, m8, k, cull_window)

    # tracking-only step cost for comparison
    st = tracker.state
    imgs = np.stack([frames[i][0] for i in range(4)])
    depths = np.stack([frames[i][1] for i in range(4)])

    def track4(s):
        return tracker._step.rgbd_batch(s, imgs, depths)

    timed("auto_step rgbd_batch (4 frames)", track4, st)


if __name__ == "__main__":
    main()
