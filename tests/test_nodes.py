"""Streaming node layer: pairing semantics + live RGB-D tracking."""
import numpy as np

from orb_slam2_with_comment_tpu import Sensor, System
from orb_slam2_with_comment_tpu.nodes import RGBDNode, _PairingQueue
from orb_slam2_with_comment_tpu.dataio.synthetic import (
    SyntheticWorld, orbit_trajectory)
from orb_slam2_with_comment_tpu.mapstate.map import MapConfig
from orb_slam2_with_comment_tpu.pipeline import TrackerConfig


class TestPairingQueue:
    def test_exact_match(self):
        q = _PairingQueue(slop=0.01)
        assert q.push("a", 1.000, "A") is None
        got = q.push("b", 1.004, "B")
        assert got == (1.000, "A", "B")

    def test_drops_stale(self):
        q = _PairingQueue(slop=0.01)
        q.push("a", 1.0, "A0")
        q.push("a", 2.0, "A1")
        got = q.push("b", 2.001, "B")
        assert got == (2.0, "A1", "B")
        assert q.dropped == 1

    def test_out_of_slop_never_pairs(self):
        q = _PairingQueue(slop=0.005)
        q.push("a", 1.0, "A")
        assert q.push("b", 1.5, "B") is None


class TestRgbdNode:
    def test_live_stream_tracks(self):
        cfg = TrackerConfig(
            n_features=600, min_init_features=150,
            map_cfg=MapConfig(k_max=6, n_feat=600, l_max=3000, d_max=8),
            fps=10)
        slam = System(config=cfg, sensor=Sensor.RGBD)
        node = RGBDNode(slam, slop=0.02)
        poses = []
        node.pose_callback = lambda ts, pose: poses.append((ts, np.asarray(pose).shape))

        world = SyntheticWorld(seed=1)
        traj = orbit_trajectory(n_frames=10)
        rng = np.random.RandomState(0)
        for k, (R, t) in enumerate(traj):
            img, depth = world.render(R, t)
            ts = k / 10.0
            # depth and rgb arrive as separate messages with jitter < slop
            node.on_depth(depth, ts + float(rng.uniform(0, 0.01)))
            node.on_rgb(img, ts)
        slam.tracker.flush()
        assert node.stats.frames_tracked >= 7, node.stats
        assert len(poses) == node.stats.frames_tracked

    def test_depth_factor_applied(self):
        cfg = TrackerConfig(
            n_features=600, min_init_features=150,
            map_cfg=MapConfig(k_max=6, n_feat=600, l_max=3000, d_max=8),
            fps=10)
        slam = System(config=cfg, sensor=Sensor.RGBD)
        node = RGBDNode(slam, depth_factor=5000.0)
        world = SyntheticWorld(seed=1)
        traj = orbit_trajectory(n_frames=2)
        img, depth = world.render(*traj[0])
        node.on_rgb(img, 0.0)
        ok = node.on_depth((depth * 5000.0).astype(np.float32), 0.0)
        # initialization succeeds only if depths decoded to meters
        assert ok
