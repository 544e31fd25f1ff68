"""Data-parallel SLAM: independent sequences sharded over a device mesh.

The reference is strictly single-sequence, single-machine (SURVEY §2.5).
The BASELINE.md scaling axis it lacks — "KITTI 00-10 sharded across N>=2
hosts, frames/s scaling" — is the batch-of-sequences axis: each device
(or host) runs its own autonomous tracker (pipeline.auto) over its own
sequence, with NO cross-device communication in the steady state (SLAM
maps of different sequences are independent). This module shards the
full AutoState pytree over a mesh axis with `shard_map`, so ONE jitted
program advances every sequence by one frame:

    states' = sharded_step(states, imgs, depths)     # [B, ...] over mesh

Inside the shard each device runs the REAL autonomous step — `shard_map`
keeps `lax.cond` as genuine branches per device (a `vmap` over sequences
would flatten keyframe maintenance into executed-by-all selects), which
is exactly why this is a shard_map and not a vmap.

Scaling efficiency is near-perfect by construction (zero collectives);
the harness exists so the driver and tests can DEMONSTRATE it on a
virtual multi-device mesh and so multi-host launches (jax.distributed)
have a ready entry point.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..pipeline import auto as auto_mod
from ..pipeline.tracking import TrackerConfig


def stack_states(states: list[auto_mod.AutoState]) -> auto_mod.AutoState:
    """Stack B per-sequence AutoStates into one [B, ...] pytree."""
    return jax.tree.map(lambda *xs: jnp.stack(xs), *states)


def unstack_state(states, i: int) -> auto_mod.AutoState:
    """Extract sequence i's AutoState from the stacked pytree (host-side,
    e.g. for finalize)."""
    return jax.tree.map(lambda x: x[i], states)


class MultiSeqTracker:
    """B autonomous RGB-D trackers advancing in lockstep over a mesh.

    Usage:
        mesh = Mesh(np.array(jax.devices()), ("seq",))
        mt = MultiSeqTracker(cfg, n_seq=len(jax.devices()), mesh=mesh)
        for batch_img, batch_depth in frames:      # [B, H, W] each
            mt.process_rgbd(batch_img, batch_depth)
        outs = mt.finalize()                        # list of per-seq dicts
    """

    def __init__(self, cfg: TrackerConfig, n_seq: int, mesh: Mesh,
                 auto_cfg: auto_mod.AutoTrackerConfig | None = None):
        if n_seq % mesh.devices.size != 0:
            raise ValueError(
                f"n_seq ({n_seq}) must be a multiple of the mesh size "
                f"({mesh.devices.size})")
        self.cfg = cfg
        self.n_seq = n_seq
        self.mesh = mesh
        self.auto_cfg = auto_cfg or auto_mod.AutoTrackerConfig()
        from ..frontend import OrbExtractor
        extractor = OrbExtractor(n_features=cfg.n_features)
        voc = None
        if self.auto_cfg.loop_closing:
            from ..place.vocabulary import load_default_vocabulary
            voc = load_default_vocabulary(as_numpy=True)
        step = auto_mod.build_auto_step(
            extractor, cfg, self.auto_cfg.traj_capacity, voc=voc,
            loop_closing=self.auto_cfg.loop_closing)

        n_words = voc.n_words if voc is not None else 1
        states = [auto_mod.empty_auto_state(
            cfg, self.auto_cfg.traj_capacity, n_words)
            for _ in range(n_seq)]
        spec = P("seq")
        self._sharding = NamedSharding(mesh, spec)
        self.states = jax.device_put(
            stack_states(states),
            jax.tree.map(lambda _: self._sharding, states[0]))

        local = n_seq // mesh.devices.size

        def shard_body(states, imgs, depths):
            # each device advances its local sequences with the REAL step
            # (python loop over a small static count; conds stay branches)
            outs = []
            for i in range(local):
                s_i = jax.tree.map(lambda x: x[i], states)
                # the underlying step donates its state argument; inside
                # shard_map donation is managed by the outer jit
                outs.append(step.__wrapped__(s_i, imgs[i], depths[i]))
            return jax.tree.map(lambda *xs: jnp.stack(xs), *outs)

        # check_vma=False: the body is collective-free (sequences are
        # independent) and its scans mix unvarying constants (LM damping
        # init) into per-shard carries, which the varying-axes checker
        # would reject.
        self._sharded_step = jax.jit(
            shard_map(shard_body, mesh=mesh,
                      in_specs=(spec, spec, spec), out_specs=spec,
                      check_vma=False),
            donate_argnums=(0,))
        self.frame_count = 0

    def process_rgbd(self, imgs: np.ndarray, depths: np.ndarray):
        """Advance every sequence by one frame. imgs [B,H,W] uint8,
        depths [B,H,W] (raw units; converted on device)."""
        self.states = self._sharded_step(self.states, imgs, depths)
        self.frame_count += 1

    def sync(self):
        jax.block_until_ready(self.states.frame_idx)

    def finalize(self) -> list[dict]:
        """One readback of all sequences' trajectories."""
        host = jax.device_get(self.states)
        outs = []
        for i in range(self.n_seq):
            s = unstack_state(host, i)
            n = self.frame_count
            T = self.auto_cfg.traj_capacity
            order = (np.arange(n) if n <= T
                     else np.arange(n - T, n)) % T
            outs.append({
                "R": np.asarray(s.traj_R)[order],
                "t": np.asarray(s.traj_t)[order],
                "valid": np.asarray(s.traj_valid)[order],
                "stats": np.asarray(s.traj_stats)[order],
                "lost_at": int(s.lost), "initialized": bool(s.initialized),
                "n_keyframes": int(s.map.n_kf), "n_frames": n,
                "n_loops_closed": int(s.loop.n_loops),
            })
        return outs
