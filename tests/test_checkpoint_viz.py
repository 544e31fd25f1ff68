"""Checkpoint/resume + visualization export."""
import os

import numpy as np
import jax.numpy as jnp
import pytest

from orb_slam2_with_comment_tpu import checkpoint
from orb_slam2_with_comment_tpu.dataio.synthetic import SyntheticWorld, orbit_trajectory
from orb_slam2_with_comment_tpu.mapstate.map import MapConfig
from orb_slam2_with_comment_tpu.pipeline import Tracker, TrackerConfig, TrackState
from orb_slam2_with_comment_tpu.visualization import (
    draw_frame, export_map_json, export_map_ply)


@pytest.fixture(scope="module")
def short_run():
    world = SyntheticWorld(seed=1)
    poses = orbit_trajectory(n_frames=14)
    cfg = TrackerConfig(
        n_features=600, min_init_features=150,
        map_cfg=MapConfig(k_max=8, n_feat=600, l_max=4000, d_max=8), fps=10)
    tracker = Tracker(cfg)
    for k, (R, t) in enumerate(poses):
        img, depth = world.render(R, t)
        tracker.process_rgbd(img, depth, frame_id=k)
    return world, poses, cfg, tracker


class TestCheckpoint:
    def test_map_roundtrip(self, short_run, tmp_path):
        world, poses, cfg, tracker = short_run
        p = str(tmp_path / "map.npz")
        checkpoint.save_map(p, tracker.map)
        m2 = checkpoint.load_map(p)
        np.testing.assert_array_equal(np.asarray(tracker.map.lm_valid),
                                      np.asarray(m2.lm_valid))
        np.testing.assert_allclose(np.asarray(tracker.map.kf_R),
                                   np.asarray(m2.kf_R))
        assert int(m2.n_kf) == int(tracker.map.n_kf)

    def test_session_resume_tracks(self, short_run, tmp_path):
        world, poses, cfg, tracker = short_run
        p = str(tmp_path / "sess.npz")
        checkpoint.save_session(p, tracker)
        fresh = Tracker(cfg)
        checkpoint.load_session(p, fresh)
        assert fresh.n_kf_host == tracker.n_kf_host
        assert fresh.state == tracker.state
        assert len(fresh.rel_log) == len(tracker.rel_log)
        # resumed tracker must keep tracking the sequence
        n_ok = 0
        for k in range(len(poses) - 4, len(poses)):
            img, depth = world.render(*poses[k])
            out = fresh.process_rgbd(img, depth, frame_id=100 + k)
            n_ok += out is not None
        assert n_ok >= 3, n_ok


class TestVisualization:
    def test_draw_frame(self, short_run):
        world, poses, cfg, tracker = short_run
        img, _ = world.render(*poses[-1])
        obs = tracker.last_obs
        out = draw_frame(img, np.asarray(obs.feats.xy), np.asarray(obs.lm),
                         np.asarray(obs.feats.valid), state="OK",
                         n_kf=tracker.n_kf_host,
                         n_lm=int(jnp.sum(tracker.map.lm_valid)))
        assert out.dtype == np.uint8
        assert out.shape == (cfg.height + 20, cfg.width, 3)
        # overlay must have drawn some green boxes
        green = (out[:, :, 1] > 180) & (out[:, :, 0] < 100)
        assert green.sum() > 50

    def test_export_ply_json(self, short_run, tmp_path):
        world, poses, cfg, tracker = short_run
        ply = tmp_path / "map.ply"
        js = tmp_path / "map.json"
        export_map_ply(str(ply), tracker.map, tracker.n_kf_host)
        export_map_json(str(js), tracker.map, tracker.n_kf_host)
        head = ply.read_text().splitlines()
        assert head[0] == "ply"
        n = int([ln for ln in head if ln.startswith("element vertex")][0].split()[-1])
        assert n > 100
        import json
        doc = json.loads(js.read_text())
        assert len(doc["keyframes"]) == tracker.n_kf_host
        assert len(doc["points"]) > 100
