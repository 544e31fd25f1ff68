import numpy as np
import jax
import jax.numpy as jnp

from orb_slam2_with_comment_tpu.geometry import se3, sim3
from orb_slam2_with_comment_tpu.solvers import horn, initializer, pnp, sim3solver

rng = np.random.RandomState(5)
K = (500.0, 500.0, 320.0, 240.0)


def scene(n=120, depth=(3, 9)):
    return rng.uniform([-3, -2, depth[0]], [3, 2, depth[1]], (n, 3)).astype(np.float32)


def project(X, R=np.eye(3, dtype=np.float32), t=np.zeros(3, np.float32)):
    Xc = X @ R.T + t
    return np.stack([500 * Xc[:, 0] / Xc[:, 2] + 320,
                     500 * Xc[:, 1] / Xc[:, 2] + 240], -1).astype(np.float32), Xc


class TestHorn:
    def test_exact_sim3(self):
        X2 = scene(30)
        xi = np.array([0.3, -0.2, 0.1, 0.1, -0.05, 0.2, 0.25], np.float32)
        R_gt, t_gt, s_gt = sim3.exp(jnp.asarray(xi))
        X1 = np.asarray(sim3.transform(R_gt, t_gt, s_gt, jnp.asarray(X2)))
        R, t, s = horn.solve(jnp.asarray(X1)[None], jnp.asarray(X2)[None])
        np.testing.assert_allclose(np.asarray(R[0]), np.asarray(R_gt), atol=1e-4)
        np.testing.assert_allclose(float(s[0]), float(s_gt), rtol=1e-4)
        np.testing.assert_allclose(np.asarray(t[0]), np.asarray(t_gt), atol=1e-3)

    def test_rigid_no_scale(self):
        X2 = scene(20)
        R_gt, t_gt = se3.exp_se3(jnp.asarray([0.2, 0.1, -0.3, 0.05, 0.1, -0.02]))
        X1 = np.asarray(se3.transform(R_gt, t_gt, jnp.asarray(X2)))
        R, t, s = horn.solve(jnp.asarray(X1)[None], jnp.asarray(X2)[None], with_scale=False)
        assert float(s[0]) == 1.0
        np.testing.assert_allclose(np.asarray(R[0]), np.asarray(R_gt), atol=1e-4)


class TestPnP:
    def test_recovers_pose_with_outliers(self):
        X = scene(150)
        R_gt, t_gt = (np.asarray(a) for a in se3.exp_se3(
            jnp.asarray([0.2, -0.1, 0.15, 0.05, -0.03, 0.02])))
        uv, _ = project(X, R_gt, t_gt)
        uv += rng.randn(150, 2).astype(np.float32) * 0.5
        uv[:30] += rng.uniform(30, 90, (30, 2)).astype(np.float32)  # outliers
        res = pnp.solve_ransac(
            jax.random.PRNGKey(0), K, jnp.asarray(X), jnp.asarray(uv),
            jnp.ones(150, jnp.float32), jnp.ones(150, bool), max_iters=200)
        assert int(res.n_inliers) > 90
        C_est = -np.asarray(res.R).T @ np.asarray(res.t)
        C_gt = -R_gt.T @ t_gt
        assert np.linalg.norm(C_est - C_gt) < 0.05
        assert np.asarray(res.inliers)[:30].sum() <= 3

    def test_near_planar_scene(self):
        # the degenerate geometry the full beta-case EPnP exists for
        # (reference PnPsolver.cc:562-652): landmarks on an almost flat
        # wall. The single-beta shortcut loses rank here; the case-2/3
        # seeds + Gauss-Newton keep recall.
        n = 120
        X = rng.uniform([-3, -2, 6.0], [3, 2, 6.02], (n, 3)).astype(np.float32)
        R_gt, t_gt = (np.asarray(a) for a in se3.exp_se3(
            jnp.asarray([0.25, -0.15, 0.1, 0.1, -0.05, 0.03])))
        uv, _ = project(X, R_gt, t_gt)
        uv += rng.randn(n, 2).astype(np.float32) * 0.3
        res = pnp.solve_ransac(
            jax.random.PRNGKey(7), K, jnp.asarray(X), jnp.asarray(uv),
            jnp.ones(n, jnp.float32), jnp.ones(n, bool), max_iters=200)
        assert int(res.n_inliers) > 80
        C_est = -np.asarray(res.R).T @ np.asarray(res.t)
        C_gt = -R_gt.T @ t_gt
        assert np.linalg.norm(C_est - C_gt) < 0.08


class TestSim3Ransac:
    def test_recovers_sim3_with_outliers(self):
        n = 100
        X2 = scene(n, depth=(2, 7))
        xi = np.array([0.2, -0.1, 0.05, 0.06, -0.02, 0.04, 0.2], np.float32)
        R_gt, t_gt, s_gt = sim3.exp(jnp.asarray(xi))
        X1 = np.asarray(sim3.transform(R_gt, t_gt, s_gt, jnp.asarray(X2)))
        uv1, _ = project(X1)
        uv2, _ = project(X2)
        # corrupt 25 correspondences
        X2c = X2.copy()
        X2c[:25] += rng.uniform(0.5, 2.0, (25, 3)).astype(np.float32)
        res = sim3solver.solve_ransac(
            jax.random.PRNGKey(1), K, K, jnp.asarray(X1), jnp.asarray(X2c),
            jnp.asarray(uv1), jnp.asarray(uv2),
            jnp.ones(n, jnp.float32), jnp.ones(n, jnp.float32),
            jnp.ones(n, bool), max_iters=200)
        assert int(res.n_inliers) >= 60
        np.testing.assert_allclose(float(res.s), float(s_gt), rtol=0.02)
        np.testing.assert_allclose(np.asarray(res.t), np.asarray(t_gt), atol=0.05)

    def test_fix_scale(self):
        n = 60
        X2 = scene(n)
        R_gt, t_gt = (np.asarray(a) for a in se3.exp_se3(
            jnp.asarray([0.1, 0.05, -0.1, 0.02, 0.03, -0.01])))
        X1 = X2 @ R_gt.T + t_gt
        uv1, _ = project(X1)
        uv2, _ = project(X2)
        res = sim3solver.solve_ransac(
            jax.random.PRNGKey(2), K, K, jnp.asarray(X1), jnp.asarray(X2),
            jnp.asarray(uv1), jnp.asarray(uv2),
            jnp.ones(n, jnp.float32), jnp.ones(n, jnp.float32),
            jnp.ones(n, bool), max_iters=150, fix_scale=True)
        assert float(res.s) == 1.0
        assert int(res.n_inliers) >= n - 3


class TestInitializer:
    def _run(self, X, R2, t2, n_out=0):
        n = len(X)
        p1, _ = project(X)
        p2, _ = project(X, R2, t2)
        if n_out:
            p2[:n_out] += rng.uniform(20, 60, (n_out, 2)).astype(np.float32)
        return initializer.initialize(
            jax.random.PRNGKey(3), K, jnp.asarray(p1), jnp.asarray(p2),
            jnp.ones(n, bool))

    def test_general_scene_uses_f(self):
        X = scene(200, depth=(3, 10))
        R2, t2 = (np.asarray(a) for a in se3.exp_se3(
            jnp.asarray([0.4, 0.05, 0.02, 0.01, -0.06, 0.01])))
        res = self._run(X, R2, t2, n_out=20)
        assert bool(res.success)
        assert not bool(res.used_h)
        # direction of translation (scale-free) matches
        t_est = np.asarray(res.t)
        t_gt = t2 / np.linalg.norm(t2)
        cos = abs(np.dot(t_est / np.linalg.norm(t_est), t_gt))
        assert cos > 0.99, cos
        # triangulated structure matches up to scale
        g = np.asarray(res.good)
        Xe = np.asarray(res.X)[g]
        Xg = X[g]
        s = np.median(Xg[:, 2] / Xe[:, 2])
        err = np.abs(Xe * s - Xg).max(axis=1)
        assert np.median(err) < 0.2

    def test_planar_scene_uses_h(self):
        # points on a plane z = 5 + 0.2x + 0.1y
        xy = rng.uniform([-3, -2], [3, 2], (200, 2)).astype(np.float32)
        X = np.concatenate([xy, (5 + 0.2 * xy[:, :1]
                                 + 0.1 * xy[:, 1:2])], axis=1).astype(np.float32)
        R2, t2 = (np.asarray(a) for a in se3.exp_se3(
            jnp.asarray([0.5, 0.1, 0.05, 0.02, -0.08, 0.02])))
        res = self._run(X, R2, t2)
        assert bool(res.used_h)
        if bool(res.success):
            t_est = np.asarray(res.t)
            cos = abs(np.dot(t_est / np.linalg.norm(t_est), t2 / np.linalg.norm(t2)))
            assert cos > 0.98, cos

    def test_pure_rotation_rejected(self):
        X = scene(150)
        R2, _ = se3.exp_se3(jnp.asarray([0, 0, 0, 0.03, 0.05, 0.0]))
        res = self._run(X, np.asarray(R2), np.zeros(3, np.float32))
        assert not bool(res.success)  # no parallax -> init must refuse
