"""Data-parallel multi-sequence tracking over a device mesh
(parallel.multi_seq): every sequence must produce the same result it
would produce alone, with one jitted sharded step advancing all of them.
Runs on the virtual 8-device CPU mesh (conftest)."""
import numpy as np
import jax
from jax.sharding import Mesh

from orb_slam2_with_comment_tpu.dataio.synthetic import (
    SyntheticWorld, orbit_trajectory)
from orb_slam2_with_comment_tpu.mapstate.map import MapConfig
from orb_slam2_with_comment_tpu.parallel.multi_seq import MultiSeqTracker
from orb_slam2_with_comment_tpu.pipeline import (
    AutoTracker, AutoTrackerConfig, TrackerConfig)


def _cfg():
    return TrackerConfig(
        n_features=1000, min_init_features=200,
        map_cfg=MapConfig(k_max=8, n_feat=1000, l_max=4000, d_max=8),
        fps=30, depth_factor=1.0 / 5000.0)


def test_multi_seq_matches_single():
    n_dev = len(jax.devices())
    assert n_dev >= 2
    mesh = Mesh(np.array(jax.devices()), ("seq",))
    n_frames = 8
    # one distinct world per sequence
    worlds = [SyntheticWorld(seed=s) for s in range(n_dev)]
    poses = orbit_trajectory(n_frames=n_frames)
    frames = []  # [T][B,H,W]
    for R, t in poses:
        imgs, deps = [], []
        for w in worlds:
            img, d = w.render(R, t)
            imgs.append(np.clip(img, 0, 255).astype(np.uint8))
            deps.append(np.clip(d * 5000.0, 0, 65535).astype(np.uint16))
        frames.append((np.stack(imgs), np.stack(deps)))

    mt = MultiSeqTracker(_cfg(), n_seq=n_dev, mesh=mesh,
                         auto_cfg=AutoTrackerConfig(loop_closing=False))
    for imgs, deps in frames:
        mt.process_rgbd(imgs, deps)
    outs = mt.finalize()

    # each sequence initialized + tracked independently
    for i, out in enumerate(outs):
        assert out["initialized"], f"seq {i} failed to initialize"
        assert out["lost_at"] == -1, f"seq {i} lost"
        errs = [np.linalg.norm(out["t"][k] - poses[k][1])
                for k in range(n_frames) if out["valid"][k]]
        assert np.median(errs) < 0.02, f"seq {i} err {np.median(errs)}"

    # Sequence 0 must behave like a solo tracker on the same frames.
    # NOT a bitwise comparison: the sharded (shard_map) and solo programs
    # are separate XLA compilations whose fusion/reduction orders differ,
    # and last-ulp float divergence through the RANSAC thresholds can
    # shift individual matches — observed flipping on this host without
    # any source change. The guaranteed property is BEHAVIORAL
    # equivalence (same init/tracked/accuracy class); true cross-device
    # independence is asserted exactly in __graft_entry__.dryrun_multichip
    # (perturbing one sequence's input leaves the others' states
    # bit-identical, single program both times).
    solo = AutoTracker(_cfg(), AutoTrackerConfig(loop_closing=False))
    for imgs, deps in frames:
        solo.process_rgbd(imgs[0], deps[0])
    ref = solo.finalize()
    assert ref["initialized"] and ref["lost_at"] == -1
    assert ref["valid"].sum() == outs[0]["valid"].sum()
    errs_solo = [np.linalg.norm(ref["t"][k] - poses[k][1])
                 for k in range(n_frames) if ref["valid"][k]]
    assert np.median(errs_solo) < 0.02
