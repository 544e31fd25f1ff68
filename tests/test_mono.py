"""Monocular pipeline: two-view bootstrap + triangulation-fed tracking."""
import numpy as np
import jax.numpy as jnp
import pytest

from orb_slam2_with_comment_tpu.dataio.synthetic import SyntheticWorld, orbit_trajectory
from orb_slam2_with_comment_tpu.evaluation.ate import ate_rmse, camera_centers
from orb_slam2_with_comment_tpu.mapstate.map import MapConfig
from orb_slam2_with_comment_tpu.pipeline import Tracker, TrackerConfig, TrackState


@pytest.fixture(scope="module")
def mono_run():
    world = SyntheticWorld(seed=1)
    # larger lateral sweep than the RGB-D test: mono init needs parallax
    poses = orbit_trajectory(n_frames=40, x_amp=0.5)
    cfg = TrackerConfig(
        sensor="mono", n_features=800, min_init_features=150,
        min_init_matches=60,
        map_cfg=MapConfig(k_max=16, n_feat=800, l_max=6000, d_max=8),
        fps=10,
    )
    tracker = Tracker(cfg)
    results = []
    for k, (R, t) in enumerate(poses):
        img, _ = world.render(R, t)
        results.append(tracker.process_mono(img, frame_id=k))
    return tracker, poses, results


class TestMonoEndToEnd:
    def test_initializes(self, mono_run):
        tracker, poses, results = mono_run
        first = next((i for i, r in enumerate(results) if r is not None), None)
        assert first is not None, "monocular bootstrap never succeeded"
        assert first < 20, first

    def test_tracks_after_init(self, mono_run):
        tracker, poses, results = mono_run
        first = next(i for i, r in enumerate(results) if r is not None)
        after = results[first:]
        n_tracked = sum(r is not None for r in after)
        assert n_tracked >= 0.7 * len(after), (first, n_tracked, len(after))

    def test_triangulated_map(self, mono_run):
        tracker, *_ = mono_run
        assert tracker.n_kf_host >= 2
        assert int(jnp.sum(tracker.map.lm_valid)) > 80

    def test_ate_small_up_to_scale(self, mono_run):
        tracker, poses, results = mono_run
        ids, Rs, ts = tracker.trajectory_arrays()
        gt_R = np.stack([poses[i][0] for i in ids])
        gt_t = np.stack([poses[i][1] for i in ids])
        est_c = camera_centers(Rs, ts)
        gt_c = camera_centers(gt_R, gt_t)
        # monocular scale is arbitrary: align with a similarity (Umeyama-lite)
        s_num = np.sum(np.linalg.norm(gt_c - gt_c.mean(0), axis=1))
        s_den = np.sum(np.linalg.norm(est_c - est_c.mean(0), axis=1))
        s = s_num / max(s_den, 1e-9)
        est_scaled = (est_c - est_c.mean(0)) * s + gt_c.mean(0)
        rmse = ate_rmse(est_scaled, gt_c)
        # trajectory spans ~1 m laterally; sub-10 cm after scale alignment
        assert rmse < 0.35, rmse
