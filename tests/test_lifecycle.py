"""Map lifecycle: keyframe/landmark slot recycling + capacity growth.

The reference's map grows without bound (reference: Map.cc:32-44;
Tracking::NeedNewKeyFrame has no capacity clause, Tracking.cc:1140-1244).
The SoA map is fixed-capacity, so dataset-scale sequences rely on the
host maintenance pass (pipeline.tracking._run_maintenance): compaction of
culled slots and geometric capacity growth. These tests run a synthetic
sequence through deliberately tiny capacities and assert the map grows /
compacts without losing tracking or corrupting the trajectory chain.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from orb_slam2_with_comment_tpu.dataio.synthetic import (SyntheticWorld,
                                                         orbit_trajectory)
from orb_slam2_with_comment_tpu.evaluation.ate import ate_rmse, camera_centers
from orb_slam2_with_comment_tpu.mapstate.map import (
    MapConfig, compact_keyframes, empty_map, grow_map)
from orb_slam2_with_comment_tpu.pipeline import Tracker, TrackerConfig


class TestCompactKeyframes:
    def _toy_map(self):
        cfg = MapConfig(k_max=8, n_feat=16, l_max=64, d_max=4)
        m = empty_map(cfg)
        rng = np.random.default_rng(0)
        kf_valid = np.array([1, 1, 0, 1, 0, 1, 0, 0], bool)
        obs_kf = np.full((64, 4), -1, np.int32)
        obs_feat = np.zeros((64, 4), np.int32)
        lm_valid = np.zeros(64, bool)
        kf_lm = np.full((8, 16), -1, np.int32)
        for l in range(20):
            ks = np.sort(rng.choice(6, size=rng.integers(1, 4), replace=False))
            for s_i, k in enumerate(ks):
                obs_kf[l, s_i] = k
                obs_feat[l, s_i] = rng.integers(0, 16)
                kf_lm[k, obs_feat[l, s_i]] = l
            lm_valid[l] = True
        return m._replace(
            kf_valid=jnp.asarray(kf_valid), n_kf=jnp.int32(6),
            kf_frame_id=jnp.asarray([0, 3, 6, 9, 12, 15, -1, -1], jnp.int32),
            lm_obs_kf=jnp.asarray(obs_kf), lm_obs_feat=jnp.asarray(obs_feat),
            lm_valid=jnp.asarray(lm_valid), n_lm=jnp.int32(20),
            lm_first_kf=jnp.asarray(np.clip(obs_kf[:, 0], 0, 7)),
            lm_ref_kf=jnp.asarray(np.clip(obs_kf[:, 0], 0, 7)),
            kf_lm=jnp.asarray(kf_lm),
            kf_feat_valid=jnp.ones((8, 16), bool)), obs_kf

    def test_remaps_observations_and_packs_rows(self):
        m, old_obs = self._toy_map()
        m2 = compact_keyframes(m)
        assert int(m2.n_kf) == 4
        assert np.asarray(m2.kf_valid).tolist() == [True] * 4 + [False] * 4
        # live old slots 0,1,3,5 -> 0,1,2,3 (stable temporal order)
        assert np.asarray(m2.kf_frame_id)[:4].tolist() == [0, 3, 9, 15]
        rank = {0: 0, 1: 1, 3: 2, 5: 3}
        new_obs = np.asarray(m2.lm_obs_kf)
        for l in range(20):
            exp = [rank[k] for k in old_obs[l] if k in rank]
            row = new_obs[l]
            # valid entries form an in-order prefix (add_observation invariant)
            n_valid = int((row >= 0).sum())
            assert (row[:n_valid] >= 0).all() and (row[n_valid:] == -1).all()
            assert row[:n_valid].tolist() == exp

    def test_grow_preserves_counters_and_content(self):
        m, _ = self._toy_map()
        m2 = compact_keyframes(m)
        m3 = grow_map(m2, k_max=16, l_max=128)
        assert m3.kf_R.shape[0] == 16 and m3.lm_pw.shape[0] == 128
        assert int(m3.n_kf) == int(m2.n_kf) and int(m3.n_lm) == int(m2.n_lm)
        assert np.array_equal(np.asarray(m3.lm_obs_kf[:64]),
                              np.asarray(m2.lm_obs_kf))
        assert not np.asarray(m3.kf_valid)[4:].any()


@pytest.fixture(scope="module")
def lifecycle_run():
    """Orbit sequence through deliberately tiny capacities: growth and
    compaction MUST fire for the run to complete."""
    world = SyntheticWorld(seed=1)
    poses = orbit_trajectory(n_frames=60)
    cfg = TrackerConfig(
        n_features=800, min_init_features=150,
        map_cfg=MapConfig(k_max=12, n_feat=800, l_max=2500, d_max=8),
        fps=10,
    )
    tracker = Tracker(cfg)
    results = []
    for k, (R, t) in enumerate(poses):
        img, depth = world.render(R, t)
        results.append(tracker.process_rgbd(img, depth, frame_id=k))
    tracker.flush()
    return tracker, poses, results


class TestLifecycleEndToEnd:
    def test_capacity_grew_or_compacted(self, lifecycle_run):
        tracker, poses, results = lifecycle_run
        # the sequence inserts ~15-20 keyframes at k_max=12: the map must
        # have grown and/or recycled slots for the run to complete
        grew = tracker.map.kf_R.shape[0] > 12 or tracker.map.lm_pw.shape[0] > 2500
        compacted = len(tracker.kf_archive) > 0
        assert grew or compacted, (tracker.map.kf_R.shape,
                                   len(tracker.kf_archive))
        assert tracker.n_kf_host == len(tracker.kf_uids)
        assert tracker.n_kf_host <= tracker.map.kf_R.shape[0]

    def test_tracking_survives_maintenance(self, lifecycle_run):
        tracker, poses, results = lifecycle_run
        n_tracked = sum(r is not None for r in results)
        assert n_tracked == len(results), n_tracked

    def test_trajectory_resolves_across_recycling(self, lifecycle_run):
        tracker, poses, results = lifecycle_run
        ids, Rs, ts = tracker.trajectory_arrays()
        gt_R = np.stack([poses[i][0] for i in ids])
        gt_t = np.stack([poses[i][1] for i in ids])
        rmse = ate_rmse(camera_centers(Rs, ts), camera_centers(gt_R, gt_t))
        assert rmse < 0.05, rmse
        # the uid-keyed relative chain must resolve every logged frame
        from orb_slam2_with_comment_tpu.system import System
        slam = System.__new__(System)
        slam.tracker = tracker
        rows = System._chain_poses(slam)
        assert len(rows) == len(tracker.rel_log)
