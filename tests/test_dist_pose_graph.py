"""Edge-sharded pose-graph optimization on the 8-device virtual CPU mesh."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh

from orb_slam2_with_comment_tpu.geometry import se3, sim3
from orb_slam2_with_comment_tpu.optim import pose_graph
from orb_slam2_with_comment_tpu.parallel import dist_pose_graph

rng = np.random.RandomState(0)


@pytest.fixture(scope="module")
def mesh():
    devs = np.array(jax.devices()[:8])
    assert len(devs) == 8, "conftest must force an 8-device CPU platform"
    return Mesh(devs, ("edge",))


def build_ring_problem(N=16, drift_scale=0.03):
    """Chain + loop edge, measurements from ground truth; padded to a
    multiple of 8 edges with e_valid=False rows."""
    R_gt = np.zeros((N, 3, 3), np.float32)
    t_gt = np.zeros((N, 3), np.float32)
    for k in range(N):
        xi = np.array([0.4 * k, 0, 0, 0, 0.1 * k, 0], np.float32)
        R, t = se3.exp_se3(jnp.asarray(xi))
        R_gt[k], t_gt[k] = np.asarray(R), np.asarray(t)
    drift = np.cumsum(rng.randn(N, 3).astype(np.float32) * drift_scale, axis=0)
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
    E = len(e_i)
    E_pad = ((E + 7) // 8) * 8
    pad = E_pad - E
    e_valid = np.concatenate([np.ones(E, bool), np.zeros(pad, bool)])
    e_i = np.concatenate([e_i, np.zeros(pad, np.int32)])
    e_j = np.concatenate([e_j, np.zeros(pad, np.int32)])
    mR = np.concatenate([np.stack(mR), np.tile(np.eye(3, dtype=np.float32),
                                               (pad, 1, 1))])
    mt = np.concatenate([np.stack(mt), np.zeros((pad, 3), np.float32)])
    ms = np.concatenate([np.asarray(ms, np.float32), np.ones(pad, np.float32)])
    fixed = np.zeros(N, bool)
    fixed[0] = True
    prob = pose_graph.PoseGraphProblem(
        jnp.asarray(R_gt), jnp.asarray(t_est), jnp.ones(N),
        jnp.asarray(e_i), jnp.asarray(e_j), jnp.asarray(mR),
        jnp.asarray(mt), jnp.asarray(ms), jnp.asarray(e_valid),
        jnp.asarray(fixed))
    return prob, t_gt


class TestDistPoseGraph:
    def test_matches_single_device(self, mesh):
        prob, t_gt = build_ring_problem()
        res_ref = pose_graph.optimize_pose_graph(prob, iters=20)
        res = dist_pose_graph.optimize_pose_graph_sharded(prob, mesh, iters=20)
        assert float(res.chi2) < 1e-4
        np.testing.assert_allclose(np.asarray(res.t), t_gt, atol=1e-2)
        np.testing.assert_allclose(np.asarray(res.t), np.asarray(res_ref.t),
                                   atol=1e-2)

    def test_fixed_vertex_invariant(self, mesh):
        prob, _ = build_ring_problem()
        res = dist_pose_graph.optimize_pose_graph_sharded(prob, mesh, iters=5)
        np.testing.assert_allclose(np.asarray(res.t[0]),
                                   np.asarray(prob.t[0]), atol=1e-7)

    def test_fix_scale(self, mesh):
        prob, _ = build_ring_problem()
        res = dist_pose_graph.optimize_pose_graph_sharded(
            prob, mesh, iters=10, fix_scale=True)
        np.testing.assert_allclose(np.asarray(res.s), np.ones(prob.R.shape[0]),
                                   atol=1e-6)
