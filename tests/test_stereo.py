"""Stereo frontend: row-band depth association + stereo e2e tracking."""
import numpy as np
import jax.numpy as jnp
import pytest

from orb_slam2_with_comment_tpu.dataio.synthetic import SyntheticWorld, orbit_trajectory
from orb_slam2_with_comment_tpu.evaluation.ate import ate_rmse, camera_centers
from orb_slam2_with_comment_tpu.frontend import OrbExtractor
from orb_slam2_with_comment_tpu.mapstate.map import MapConfig
from orb_slam2_with_comment_tpu.pipeline import Tracker, TrackerConfig

FX, BF = 500.0, 40.0
BASELINE = BF / FX  # 8 cm


def render_stereo(world, R, t):
    img_l, depth = world.render(R, t)
    t_r = np.asarray(t, np.float32) - np.array([BASELINE, 0, 0], np.float32)
    img_r, _ = world.render(R, t_r)
    return img_l, img_r, depth


class TestStereoMatch:
    def test_depth_accuracy(self):
        world = SyntheticWorld(seed=3)
        R, t = np.eye(3, dtype=np.float32), np.zeros(3, np.float32)
        img_l, img_r, depth_gt = render_stereo(world, R, t)
        ext = OrbExtractor(n_features=800)
        feats, sd = ext.stereo(jnp.asarray(img_l), jnp.asarray(img_r), BF, FX)
        xy = np.asarray(feats.xy)
        d = np.asarray(sd.depth)
        ok = np.asarray(feats.valid) & (d > 0)
        assert ok.sum() > 200, ok.sum()  # most corners get stereo depth
        xi = np.clip(np.round(xy[:, 0]).astype(int), 0, 639)
        yi = np.clip(np.round(xy[:, 1]).astype(int), 0, 479)
        gt = depth_gt[yi, xi]
        rel = np.abs(d - gt) / np.clip(gt, 1e-6, None)
        med = np.median(rel[ok & (gt > 0)])
        assert med < 0.02, med  # subpixel disparity => ~1-2% depth error

    def test_u_right_consistency(self):
        # refined uR must equal uL - bf/depth by construction
        world = SyntheticWorld(seed=4)
        R, t = np.eye(3, dtype=np.float32), np.zeros(3, np.float32)
        img_l, img_r, _ = render_stereo(world, R, t)
        ext = OrbExtractor(n_features=400)
        feats, sd = ext.stereo(jnp.asarray(img_l), jnp.asarray(img_r), BF, FX)
        ok = np.asarray(feats.valid) & (np.asarray(sd.depth) > 0)
        ul = np.asarray(feats.xy)[:, 0]
        ur = np.asarray(sd.u_right)
        d = np.asarray(sd.depth)
        np.testing.assert_allclose((ul - ur)[ok], (BF / d)[ok], rtol=1e-4)


@pytest.fixture(scope="module")
def stereo_run():
    world = SyntheticWorld(seed=1)
    poses = orbit_trajectory(n_frames=30)
    cfg = TrackerConfig(
        n_features=800, min_init_features=150,
        map_cfg=MapConfig(k_max=16, n_feat=800, l_max=6000, d_max=8),
        fps=10,
    )
    tracker = Tracker(cfg)
    results = []
    for k, (R, t) in enumerate(poses):
        img_l, img_r, _ = render_stereo(world, R, t)
        results.append(tracker.process_stereo(img_l, img_r, frame_id=k))
    return tracker, poses, results


class TestStereoEndToEnd:
    def test_tracks(self, stereo_run):
        tracker, poses, results = stereo_run
        n_tracked = sum(r is not None for r in results)
        assert n_tracked >= 0.7 * len(results), n_tracked

    def test_map_built(self, stereo_run):
        tracker, *_ = stereo_run
        assert tracker.n_kf_host >= 1
        assert int(jnp.sum(tracker.map.lm_valid)) > 100

    def test_ate_small(self, stereo_run):
        tracker, poses, results = stereo_run
        ids, Rs, ts = tracker.trajectory_arrays()
        gt_R = np.stack([poses[i][0] for i in ids])
        gt_t = np.stack([poses[i][1] for i in ids])
        rmse = ate_rmse(camera_centers(Rs, ts), camera_centers(gt_R, gt_t))
        assert rmse < 0.25, rmse
