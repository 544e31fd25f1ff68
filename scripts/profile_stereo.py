"""Stereo front-end phase profile on real hardware (VERDICT r3 weak #3).

Times, at 640x480/1000 features and KITTI geometry 1241x376/2000
features (reference: Examples/Stereo/KITTI00-02.yaml):
  1. mono extraction            (one pyramid + FAST + BRIEF)
  2. full stereo front end      (two extractions + row-band association)
  3. full autonomous stereo step (front end + tracking + maintenance)

Run:  python scripts/profile_stereo.py
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

from orb_slam2_with_comment_tpu.frontend import OrbExtractor
from orb_slam2_with_comment_tpu.dataio.synthetic import (SyntheticWorld,
                                                         orbit_trajectory)


def timeit(fn, *args, n=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


def profile_shape(width, height, n_features, label):
    world = SyntheticWorld(seed=1)
    (R, t), = orbit_trajectory(n_frames=1)
    img, _ = world.render(R, t)
    # resize-ish: tile/crop the 640x480 render to the target shape
    reps = (height // img.shape[0] + 1, width // img.shape[1] + 1)
    big = np.tile(img, reps)[:height, :width]
    img_l = jnp.asarray(big, jnp.float32)
    img_r = jnp.roll(img_l, -6, axis=1)  # fake disparity
    ext = OrbExtractor(n_features=n_features)

    t_mono = timeit(lambda im: ext._jitted(im), img_l)
    t_st = timeit(lambda a, b: ext._jitted_stereo(
        a, b, jnp.float32(40.0), jnp.float32(500.0)), img_l, img_r)
    print(f"[{label}] {width}x{height} n={n_features}: "
          f"extract={t_mono*1e3:.2f} ms  stereo_frontend={t_st*1e3:.2f} ms "
          f"(2x extract = {2*t_mono*1e3:.2f})", flush=True)
    return t_mono, t_st


def profile_full_step():
    from orb_slam2_with_comment_tpu.mapstate.map import MapConfig
    from orb_slam2_with_comment_tpu.pipeline import (AutoTracker,
                                                     AutoTrackerConfig,
                                                     TrackerConfig)
    n_frames = 40
    world = SyntheticWorld(seed=1)
    poses = orbit_trajectory(n_frames=n_frames)
    cfg = TrackerConfig(
        sensor="stereo", n_features=1000, min_init_features=200,
        map_cfg=MapConfig(k_max=24, n_feat=1000, l_max=8000, d_max=8),
        fps=30)
    baseline = cfg.bf / cfg.fx
    frames = []
    for R, t in poses:
        img_l, _ = world.render(R, t)
        img_r, _ = world.render(np.asarray(R),
                                np.asarray(t) - np.array([baseline, 0, 0],
                                                         np.float32))
        frames.append((np.clip(img_l, 0, 255).astype(np.uint8),
                       np.clip(img_r, 0, 255).astype(np.uint8)))
    tr = AutoTracker(cfg, AutoTrackerConfig(traj_capacity=8 * n_frames,
                                            batch_frames=4))
    for l, r in frames:
        tr.process_stereo(l, r)
    tr.sync()
    for rep in range(2):
        t0 = time.perf_counter()
        for l, r in frames:
            tr.process_stereo(l, r)
        tr.sync()
        dt = time.perf_counter() - t0
        print(f"full stereo step pass {rep}: {n_frames/dt:.2f} fps "
              f"({dt/n_frames*1e3:.2f} ms/frame)", flush=True)


if __name__ == "__main__":
    profile_shape(640, 480, 1000, "TUM-shape")
    profile_shape(1248, 376, 2000, "KITTI-shape")
    profile_full_step()
