"""Compile-probe the new loop-closing pieces one at a time on TPU to
locate a scatter_emitter CHECK crash."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from orb_slam2_with_comment_tpu.runtime import enable_compilation_cache

enable_compilation_cache()

from orb_slam2_with_comment_tpu.mapstate.map import MapConfig, empty_map
from orb_slam2_with_comment_tpu.pipeline import TrackerConfig
from orb_slam2_with_comment_tpu.pipeline import auto_loop
from orb_slam2_with_comment_tpu.place.vocabulary import (
    load_default_vocabulary)

WHICH = os.environ.get("WHICH", "grow")


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def main():
    cfg = TrackerConfig(
        n_features=1000, min_init_features=200,
        map_cfg=MapConfig(k_max=24, n_feat=1000, l_max=8000, d_max=8),
        fps=30, depth_factor=1.0 / 5000.0)
    m = empty_map(cfg.map_cfg)
    cam = cfg.cam
    kf = jnp.int32(3)
    cand = jnp.int32(1)
    N = cfg.n_features
    log(f"probing {WHICH}")
    if WHICH == "grow":
        idx = jnp.zeros(N, jnp.int32)
        matched = jnp.zeros(N, bool)
        f = jax.jit(lambda m: auto_loop.sim3_grow_matches(
            m, cam, kf, cand, idx, matched, jnp.eye(3), jnp.zeros(3),
            jnp.ones(())))
        out = f(m)
    elif WHICH == "gate":
        already = jnp.zeros(N, bool)
        f = jax.jit(lambda m: auto_loop.sim3_accept_gate(
            m, cam, kf, cand, jnp.eye(3), jnp.zeros(3), jnp.ones(()),
            already, cfg.width, cfg.height))
        out = f(m)
    elif WHICH == "solve":
        loop = auto_loop.empty_loop_carry(24, 16)
        f = jax.jit(lambda m: auto_loop._sim3_solve(
            loop, m, cam, kf, cand, True))
        out = f(m)
    elif WHICH == "reloc":
        # round-robin candidate pick in isolation
        from orb_slam2_with_comment_tpu.ops import prims
        def pick(scr, frame_idx, lost):
            top_s, top_i = prims.sort_top_k(scr, 5)
            n_cand = jnp.sum((top_s > 0).astype(jnp.int32))
            p = jnp.mod(frame_idx - jnp.maximum(lost, 0),
                        jnp.clip(n_cand, 1, None))
            return top_i[p].astype(jnp.int32), top_s[p] > 0
        f = jax.jit(pick)
        out = f(jnp.zeros(24), jnp.int32(5), jnp.int32(2))
    jax.block_until_ready(out)
    log(f"{WHICH}: compiled + ran OK")


if __name__ == "__main__":
    main()
