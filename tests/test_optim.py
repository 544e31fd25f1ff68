import numpy as np
import jax
import jax.numpy as jnp

from orb_slam2_with_comment_tpu.geometry import se3, sim3
from orb_slam2_with_comment_tpu.optim import pose_opt, ba, pose_graph, sim3_opt
from orb_slam2_with_comment_tpu.optim.residuals import CamParams

rng = np.random.RandomState(42)
CAM = CamParams(*[jnp.float32(v) for v in (500.0, 500.0, 320.0, 240.0, 40.0)])


def make_scene(n_pts=200, depth=(4, 10)):
    X = rng.uniform([-3, -2, depth[0]], [3, 2, depth[1]], (n_pts, 3)).astype(np.float32)
    return X


def project_gt(R, t, X, stereo=True):
    Xc = X @ np.asarray(R).T + np.asarray(t)
    u = 500.0 * Xc[:, 0] / Xc[:, 2] + 320.0
    v = 500.0 * Xc[:, 1] / Xc[:, 2] + 240.0
    ur = u - 40.0 / Xc[:, 2]
    if not stereo:
        ur = -np.ones_like(ur)
    return np.stack([u, v, ur], axis=-1).astype(np.float32)


class TestPoseOpt:
    def test_recovers_pose_clean(self):
        X = make_scene()
        xi_gt = np.array([0.1, -0.05, 0.08, 0.02, -0.03, 0.01], np.float32)
        R_gt, t_gt = se3.exp_se3(jnp.asarray(xi_gt))
        obs = project_gt(R_gt, t_gt, X)
        # Perturbed start
        xi0 = xi_gt + rng.randn(6).astype(np.float32) * 0.03
        R0, t0 = se3.exp_se3(jnp.asarray(xi0))
        res = pose_opt.optimize_pose(
            CAM, R0, t0, jnp.asarray(X), jnp.asarray(obs),
            jnp.ones(len(X), jnp.float32), jnp.ones(len(X), jnp.bool_))
        np.testing.assert_allclose(np.asarray(res.R), np.asarray(R_gt), atol=1e-4)
        np.testing.assert_allclose(np.asarray(res.t), np.asarray(t_gt), atol=1e-3)
        assert int(res.n_inliers) == len(X)

    def test_outlier_rejection(self):
        X = make_scene()
        R_gt, t_gt = se3.exp_se3(jnp.asarray(np.zeros(6, np.float32)))
        obs = project_gt(R_gt, t_gt, X)
        n_out = 40
        obs[:n_out, :2] += rng.uniform(20, 80, (n_out, 2)).astype(np.float32)
        xi0 = rng.randn(6).astype(np.float32) * 0.02
        R0, t0 = se3.exp_se3(jnp.asarray(xi0))
        res = pose_opt.optimize_pose(
            CAM, R0, t0, jnp.asarray(X), jnp.asarray(obs),
            jnp.ones(len(X), jnp.float32), jnp.ones(len(X), jnp.bool_))
        inl = np.asarray(res.inliers)
        assert inl[:n_out].sum() <= 3  # outliers rejected
        assert inl[n_out:].sum() >= len(X) - n_out - 3
        np.testing.assert_allclose(np.asarray(res.t), np.asarray(t_gt), atol=5e-3)

    def test_mono_only(self):
        X = make_scene()
        xi_gt = np.array([0.05, 0.02, -0.04, 0.01, 0.02, -0.01], np.float32)
        R_gt, t_gt = se3.exp_se3(jnp.asarray(xi_gt))
        obs = project_gt(R_gt, t_gt, X, stereo=False)
        R0, t0 = se3.exp_se3(jnp.asarray(xi_gt + rng.randn(6).astype(np.float32) * 0.02))
        res = pose_opt.optimize_pose(
            CAM, R0, t0, jnp.asarray(X), jnp.asarray(obs),
            jnp.ones(len(X), jnp.float32), jnp.ones(len(X), jnp.bool_))
        np.testing.assert_allclose(np.asarray(res.t), np.asarray(t_gt), atol=2e-3)


def build_ba_problem(n_poses=5, n_pts=120, noise=0.3, perturb=True, stereo=True):
    X = make_scene(n_pts, depth=(5, 12))
    poses = []
    for k in range(n_poses):
        xi = np.array([0.15 * k, 0.01 * k, 0.0, 0.0, 0.02 * k, 0.0], np.float32)
        Rk, tk = se3.exp_se3(jnp.asarray(xi))
        poses.append((np.asarray(Rk), np.asarray(tk)))
    R_gt = np.stack([p[0] for p in poses])
    t_gt = np.stack([p[1] for p in poses])
    D = n_poses
    obs_pose = np.tile(np.arange(n_poses, dtype=np.int32), (n_pts, 1))
    obs_uvr = np.stack(
        [project_gt(R_gt[k], t_gt[k], X, stereo) for k in range(n_poses)], axis=1
    )
    obs_uvr[..., :2] += rng.randn(n_pts, D, 2).astype(np.float32) * noise
    obs_w = np.ones((n_pts, D), np.float32)
    if perturb:
        R0 = R_gt.copy()
        t0 = t_gt + np.concatenate(
            [np.zeros((1, 3)), rng.randn(n_poses - 1, 3) * 0.02]
        ).astype(np.float32)
        X0 = X + rng.randn(n_pts, 3).astype(np.float32) * 0.05
    else:
        R0, t0, X0 = R_gt, t_gt, X
    fixed = np.zeros(n_poses, bool)
    fixed[0] = True
    prob = ba.BAProblem(
        jnp.asarray(R0), jnp.asarray(t0), jnp.asarray(X0),
        jnp.asarray(obs_pose), jnp.asarray(obs_uvr), jnp.asarray(obs_w),
        jnp.asarray(fixed), jnp.ones(n_pts, jnp.bool_),
    )
    return prob, R_gt, t_gt, X


class TestBA:
    def test_reduces_chi2_and_recovers(self):
        prob, R_gt, t_gt, X_gt = build_ba_problem(noise=0.0)
        res = ba.ba_solve(CAM, prob, iters=15, robust=False)
        assert float(res.chi2) < 1e-2 * prob.obs_w.size
        np.testing.assert_allclose(np.asarray(res.t), t_gt, atol=5e-3)
        np.testing.assert_allclose(np.asarray(res.X), X_gt, atol=2e-2)

    def test_noisy_converges_to_noise_floor(self):
        prob, *_ = build_ba_problem(noise=0.3)
        res = ba.ba_solve(CAM, prob, iters=15, robust=True)
        n_obs = prob.obs_w.size
        # expected chi2 ~ n_obs * sigma^2 * 2-3 dof with sigma=0.3, w=1
        assert float(res.chi2) < n_obs * 0.3 ** 2 * 5

    def test_fixed_pose_stays(self):
        prob, R_gt, t_gt, _ = build_ba_problem()
        res = ba.ba_solve(CAM, prob, iters=10)
        np.testing.assert_allclose(np.asarray(res.R[0]), np.asarray(prob.R[0]), atol=1e-7)
        np.testing.assert_allclose(np.asarray(res.t[0]), np.asarray(prob.t[0]), atol=1e-7)

    def test_masked_obs_ignored(self):
        prob, *_ = build_ba_problem(noise=0.0)
        # corrupt some observations but zero their weight: result unaffected
        uvr = np.asarray(prob.obs_uvr).copy()
        w = np.asarray(prob.obs_w).copy()
        uvr[:10, 2, :2] += 500.0
        w[:10, 2] = 0.0
        prob2 = prob._replace(obs_uvr=jnp.asarray(uvr), obs_w=jnp.asarray(w))
        res = ba.ba_solve(CAM, prob2, iters=15, robust=False)
        assert float(res.chi2) < 1e-2 * prob.obs_w.size


class TestBASolveCG:
    """CG-on-Schur engine (ba.ba_solve_cg): must agree with the dense
    engine — same BAProblem layout, no dense [P*6, P*6] system."""

    def test_matches_dense_engine(self):
        prob, R_gt, t_gt, X_gt = build_ba_problem(noise=0.3)
        r_dense = ba.ba_solve(CAM, prob, iters=10, robust=True)
        r_cg = ba.ba_solve_cg(CAM, prob, iters=10, cg_iters=50, robust=True)
        assert float(r_cg.chi2) <= 1.05 * float(r_dense.chi2) + 1e-3, (
            float(r_dense.chi2), float(r_cg.chi2))
        np.testing.assert_allclose(np.asarray(r_cg.t), np.asarray(r_dense.t),
                                   atol=2e-3)

    def test_clean_converges(self):
        prob, R_gt, t_gt, X_gt = build_ba_problem(noise=0.0)
        res = ba.ba_solve_cg(CAM, prob, iters=15, cg_iters=50, robust=False)
        assert float(res.chi2) < 1e-2 * prob.obs_w.size
        np.testing.assert_allclose(np.asarray(res.t), t_gt, atol=1e-3)

    def test_fixed_pose_stays(self):
        prob, R_gt, t_gt, X_gt = build_ba_problem(noise=0.2)
        res = ba.ba_solve_cg(CAM, prob, iters=8)
        np.testing.assert_allclose(np.asarray(res.R[0]), R_gt[0], atol=1e-6)
        np.testing.assert_allclose(np.asarray(res.t[0]), t_gt[0], atol=1e-6)


class TestPoseGraph:
    def test_loop_distribution(self):
        # Chain 0..9 with identity-ish odometry, then a loop edge 9->0 whose
        # measurement reveals accumulated drift; optimization spreads it.
        N = 10
        R_gt = np.zeros((N, 3, 3), np.float32)
        t_gt = np.zeros((N, 3), np.float32)
        for k in range(N):
            xi = np.array([0.5 * k, 0, 0, 0, 0.15 * k, 0], np.float32)
            R, t = se3.exp_se3(jnp.asarray(xi))
            R_gt[k], t_gt[k] = np.asarray(R), np.asarray(t)
        s_gt = np.ones(N, np.float32)
        # Drifted estimates: growing error
        drift = np.cumsum(rng.randn(N, 3).astype(np.float32) * 0.03, axis=0)
        drift -= drift[0]  # vertex 0 is the gauge anchor — keep it exact
        t_est = t_gt + drift
        R_est = R_gt.copy()
        # Edges: consecutive (measurements from GT => they encode truth)
        e_i = np.arange(N - 1, dtype=np.int32)
        e_j = np.arange(1, N, dtype=np.int32)
        e_i = np.concatenate([e_i, [N - 1]]).astype(np.int32)
        e_j = np.concatenate([e_j, [0]]).astype(np.int32)
        mR, mt, ms = [], [], []
        for i, j in zip(e_i, e_j):
            Rj, tj, sj = jnp.asarray(R_gt[j]), jnp.asarray(t_gt[j]), jnp.float32(1.0)
            Ri_inv, ti_inv, si_inv = sim3.inverse(
                jnp.asarray(R_gt[i]), jnp.asarray(t_gt[i]), jnp.float32(1.0))
            Rm, tm, sm = sim3.compose(Rj, tj, sj, Ri_inv, ti_inv, si_inv)
            mR.append(np.asarray(Rm)); mt.append(np.asarray(tm)); ms.append(float(sm))
        fixed = np.zeros(N, bool); fixed[0] = True
        prob = pose_graph.PoseGraphProblem(
            jnp.asarray(R_est), jnp.asarray(t_est), jnp.asarray(s_gt),
            jnp.asarray(e_i), jnp.asarray(e_j),
            jnp.asarray(np.stack(mR)), jnp.asarray(np.stack(mt)),
            jnp.asarray(np.array(ms, np.float32)),
            jnp.ones(len(e_i), jnp.bool_), jnp.asarray(fixed))
        res = pose_graph.optimize_pose_graph(prob, iters=20)
        assert float(res.chi2) < 1e-4
        np.testing.assert_allclose(np.asarray(res.t), t_gt, atol=1e-2)

    def test_fix_scale(self):
        N = 4
        R = np.tile(np.eye(3, dtype=np.float32), (N, 1, 1))
        t = np.zeros((N, 3), np.float32)
        t[:, 0] = np.arange(N)
        s = np.ones(N, np.float32)
        e_i = np.arange(N - 1, dtype=np.int32)
        e_j = np.arange(1, N, dtype=np.int32)
        mR = np.tile(np.eye(3, dtype=np.float32), (N - 1, 1, 1))
        mt = np.tile(np.array([1.0, 0, 0], np.float32), (N - 1, 1))
        ms = np.ones(N - 1, np.float32)
        fixed = np.zeros(N, bool); fixed[0] = True
        prob = pose_graph.PoseGraphProblem(
            jnp.asarray(R), jnp.asarray(t * 1.1), jnp.asarray(s),
            jnp.asarray(e_i), jnp.asarray(e_j), jnp.asarray(mR),
            jnp.asarray(mt), jnp.asarray(ms),
            jnp.ones(N - 1, jnp.bool_), jnp.asarray(fixed))
        res = pose_graph.optimize_pose_graph(prob, iters=15, fix_scale=True)
        np.testing.assert_allclose(np.asarray(res.s), s, atol=1e-6)
        np.testing.assert_allclose(np.asarray(res.t)[:, 0], t[:, 0], atol=1e-2)

    def test_cg_matches_dense(self):
        """The matrix-free CG essential-graph solver (dataset-scale path)
        must reach the same optimum as the dense Cholesky solver on a
        loop-distribution problem."""
        N = 40
        R_gt = np.zeros((N, 3, 3), np.float32)
        t_gt = np.zeros((N, 3), np.float32)
        for k in range(N):
            xi = np.array([0.2 * k, 0, 0, 0, 0.05 * k, 0], np.float32)
            R, t = se3.exp_se3(jnp.asarray(xi))
            R_gt[k], t_gt[k] = np.asarray(R), np.asarray(t)
        drift = np.cumsum(rng.randn(N, 3).astype(np.float32) * 0.02, axis=0)
        drift -= drift[0]
        t_est = t_gt + drift
        e_i = np.concatenate([np.arange(N - 1), [N - 1]]).astype(np.int32)
        e_j = np.concatenate([np.arange(1, N), [0]]).astype(np.int32)
        mR, mt, ms = [], [], []
        for i, j in zip(e_i, e_j):
            Rm, tm, sm = sim3.compose(
                jnp.asarray(R_gt[j]), jnp.asarray(t_gt[j]), jnp.float32(1.0),
                *sim3.inverse(jnp.asarray(R_gt[i]), jnp.asarray(t_gt[i]),
                              jnp.float32(1.0)))
            mR.append(np.asarray(Rm))
            mt.append(np.asarray(tm))
            ms.append(float(sm))
        fixed = np.zeros(N, bool)
        fixed[0] = True
        prob = pose_graph.PoseGraphProblem(
            jnp.asarray(R_gt), jnp.asarray(t_est),
            jnp.ones(N, jnp.float32),
            jnp.asarray(e_i), jnp.asarray(e_j),
            jnp.asarray(np.stack(mR)), jnp.asarray(np.stack(mt)),
            jnp.asarray(np.array(ms, np.float32)),
            jnp.ones(len(e_i), jnp.bool_), jnp.asarray(fixed))
        dense = pose_graph.optimize_pose_graph(prob, iters=20)
        cg = pose_graph.optimize_pose_graph_cg(prob, iters=20)
        assert float(cg.chi2) < 1e-4, float(cg.chi2)
        np.testing.assert_allclose(np.asarray(cg.t), np.asarray(dense.t),
                                   atol=2e-3)
        np.testing.assert_allclose(np.asarray(cg.t), t_gt, atol=1e-2)


class TestSim3Opt:
    def test_recover_sim3(self):
        N = 100
        X2 = make_scene(N, depth=(3, 8))  # points in camera-2 frame
        xi_gt = np.array([0.2, -0.1, 0.05, 0.04, -0.02, 0.03, 0.15], np.float32)
        R_gt, t_gt, s_gt = sim3.exp(jnp.asarray(xi_gt))
        X1 = np.asarray(sim3.transform(R_gt, t_gt, s_gt, jnp.asarray(X2)))
        K = (500.0, 500.0, 320.0, 240.0)
        obs1 = np.stack([500 * X1[:, 0] / X1[:, 2] + 320, 500 * X1[:, 1] / X1[:, 2] + 240], -1)
        obs2 = np.stack([500 * X2[:, 0] / X2[:, 2] + 320, 500 * X2[:, 1] / X2[:, 2] + 240], -1)
        xi0 = xi_gt + rng.randn(7).astype(np.float32) * 0.02
        R0, t0, s0 = sim3.exp(jnp.asarray(xi0))
        res = sim3_opt.optimize_sim3(
            K, K, R0, t0, s0, jnp.asarray(X1.astype(np.float32)),
            jnp.asarray(X2), jnp.asarray(obs1.astype(np.float32)),
            jnp.asarray(obs2.astype(np.float32)),
            jnp.ones(N, jnp.float32), jnp.ones(N, jnp.float32),
            jnp.ones(N, jnp.bool_), iters=12)
        np.testing.assert_allclose(float(res.s), float(s_gt), rtol=1e-3)
        np.testing.assert_allclose(np.asarray(res.t), np.asarray(t_gt), atol=5e-3)
        assert int(res.n_inliers) == N
