"""Distributed BA on the 8-device virtual CPU mesh (SURVEY §4d)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh

from orb_slam2_with_comment_tpu.geometry import se3
from orb_slam2_with_comment_tpu.optim import ba
from orb_slam2_with_comment_tpu.optim.residuals import CamParams
from orb_slam2_with_comment_tpu.parallel import dist_ba

from test_optim import build_ba_problem, CAM


@pytest.fixture(scope="module")
def mesh():
    devs = np.array(jax.devices()[:8])
    assert len(devs) == 8, "conftest must force an 8-device CPU platform"
    return Mesh(devs, ("lm",))


class TestDistributedBA:
    def test_matches_single_device(self, mesh):
        prob, R_gt, t_gt, X_gt = build_ba_problem(n_poses=4, n_pts=128, noise=0.0)
        R, t, X, chi2 = dist_ba.ba_solve_sharded(CAM, prob, mesh, iters=12)
        np.testing.assert_allclose(np.asarray(t), t_gt, atol=5e-3)
        np.testing.assert_allclose(np.asarray(X), X_gt, atol=2e-2)

    def test_chi2_decreases(self, mesh):
        prob, *_ = build_ba_problem(n_poses=4, n_pts=128, noise=0.5)
        _, _, _, chi2_0 = dist_ba.ba_step_sharded(CAM, prob, mesh)
        R, t, X, chi2_end = dist_ba.ba_solve_sharded(CAM, prob, mesh, iters=8)
        assert float(chi2_end) < float(chi2_0)

    def test_fixed_pose_invariant(self, mesh):
        prob, *_ = build_ba_problem(n_poses=4, n_pts=128)
        R, t, X, _ = dist_ba.ba_solve_sharded(CAM, prob, mesh, iters=5)
        np.testing.assert_allclose(np.asarray(R[0]), np.asarray(prob.R[0]), atol=1e-7)
        np.testing.assert_allclose(np.asarray(t[0]), np.asarray(prob.t[0]), atol=1e-7)
