"""Evaluation metrics: ATE alignment + RPE / KITTI drift protocols."""
import numpy as np

from orb_slam2_with_comment_tpu.evaluation import (
    align_umeyama, ate_rmse, kitti_segment_drift, rpe)


def _traj(n=120, seed=0):
    """Smooth ground-truth trajectory as world->camera (R, t) arrays."""
    rng = np.random.RandomState(seed)
    ang = np.linspace(0, np.pi / 3, n)
    Rs, ts = [], []
    for a in ang:
        c, s = np.cos(a), np.sin(a)
        R = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]])
        C = np.array([10 * np.sin(a), 0.5 * a, 10 * (1 - np.cos(a))])
        Rs.append(R)
        ts.append(-R @ C)
    return np.stack(Rs), np.stack(ts)


class TestRpe:
    def test_zero_error_on_identical(self):
        R, t = _traj()
        out = rpe(R, t, R, t, delta=1)
        assert out["trans_rmse"] < 1e-9
        assert out["rot_rmse"] < 1e-6
        assert out["n_pairs"] == len(R) - 1

    def test_rigid_offset_is_invisible(self):
        # RPE compares relative motions: a global rigid transform of the
        # estimate must not change it
        R, t = _traj()
        a = 0.7
        c, s = np.cos(a), np.sin(a)
        Rg = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]])
        tg = np.array([3.0, -2.0, 1.0])
        # world' = Rg world + tg  =>  Tcw' = Tcw * Tg^-1
        R2 = np.einsum("nij,jk->nik", R, Rg.T)
        t2 = t - np.einsum("nij,j->ni", R2, tg)
        out = rpe(R2, t2, R, t, delta=5)
        assert out["trans_rmse"] < 1e-9
        assert out["rot_rmse"] < 1e-6

    def test_detects_drift(self):
        R, t = _traj()
        # inject per-frame translation drift along x (in camera frame)
        drift = np.cumsum(np.full((len(t), 1), 0.01), axis=0)
        t2 = t + np.concatenate([drift, np.zeros((len(t), 2))], axis=1)
        out = rpe(R, t2, R, t, delta=1)
        assert 0.005 < out["trans_rmse"] < 0.05

    def test_rotation_error_measured(self):
        R, t = _traj()
        # constant small per-frame rotation perturbation, growing with index
        th = 0.002
        R2 = R.copy()
        for i in range(len(R)):
            a = th * i
            c, s = np.cos(a), np.sin(a)
            Rz = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]])
            R2[i] = Rz @ R[i]
        out = rpe(R2, t, R, t, delta=1)
        assert abs(out["rot_mean"] - th) < th * 0.2


class TestKittiDrift:
    def test_zero_on_identical(self):
        R, t = _traj(n=400)
        out = kitti_segment_drift(R, t, R, t, lengths=(2, 4))
        assert out["n_segments"] > 0
        assert out["trans_pct"] < 1e-7

    def test_scale_error_shows_as_translation_drift(self):
        R, t = _traj(n=400)
        out = kitti_segment_drift(R, 1.05 * t, R, t, lengths=(2, 4))
        # 5% scale error ~ 5% translational drift
        assert 2.0 < out["trans_pct"] < 9.0


class TestAteStillWorks:
    def test_ate_scale_alignment(self):
        R, t = _traj()
        C = -np.einsum("nij,ni->nj", R, t)
        s, Rg, tg = align_umeyama(0.5 * C, C, with_scale=True)
        assert abs(s - 2.0) < 1e-6
        assert ate_rmse(0.5 * C, C, with_scale=True) < 1e-9
