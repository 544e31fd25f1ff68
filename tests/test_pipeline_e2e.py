"""End-to-end RGB-D tracking on a synthetic sequence (SURVEY §7 phase-4
milestone, scaled to CI size)."""
import numpy as np
import jax.numpy as jnp
import pytest

from orb_slam2_with_comment_tpu.dataio.synthetic import SyntheticWorld, orbit_trajectory
from orb_slam2_with_comment_tpu.evaluation.ate import ate_rmse, camera_centers
from orb_slam2_with_comment_tpu.mapstate.map import MapConfig
from orb_slam2_with_comment_tpu.pipeline import Tracker, TrackerConfig, TrackState


@pytest.fixture(scope="module")
def rgbd_run():
    world = SyntheticWorld(seed=1)
    # 60 frames over the orbit: per-frame motion/acceleration in the same
    # regime as a real 30 fps hand-held sequence
    poses = orbit_trajectory(n_frames=60)
    cfg = TrackerConfig(
        n_features=800, min_init_features=150,
        map_cfg=MapConfig(k_max=24, n_feat=800, l_max=6000, d_max=8),
        fps=10,
    )
    tracker = Tracker(cfg)
    results = []
    for k, (R, t) in enumerate(poses):
        img, depth = world.render(R, t)
        out = tracker.process_rgbd(img, depth, frame_id=k)
        results.append(out)
    return tracker, poses, results


class TestRgbdEndToEnd:
    def test_initializes_and_tracks(self, rgbd_run):
        tracker, poses, results = rgbd_run
        # reference-parity bar: a benign synthetic orbit must hold
        # tracking on EVERY frame (VERDICT r1 weak #3)
        n_tracked = sum(r is not None for r in results)
        assert n_tracked == len(results), n_tracked

    def test_keyframes_and_landmarks(self, rgbd_run):
        tracker, *_ = rgbd_run
        assert tracker.n_kf_host >= 1
        assert int(tracker.map.n_lm) > 100
        assert int(jnp.sum(tracker.map.lm_valid)) > 100

    def test_ate_small(self, rgbd_run):
        tracker, poses, results = rgbd_run
        ids, Rs, ts = tracker.trajectory_arrays()
        gt_R = np.stack([poses[i][0] for i in ids])
        gt_t = np.stack([poses[i][1] for i in ids])
        est_c = camera_centers(Rs, ts)
        gt_c = camera_centers(gt_R, gt_t)
        rmse = ate_rmse(est_c, gt_c)
        # trajectory spans ~1.2 m: cm-level bar (reference is 1.6 cm on
        # fr1/desk-scale motion, BASELINE.md)
        assert rmse < 0.05, rmse
