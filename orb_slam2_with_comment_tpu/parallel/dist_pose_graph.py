"""Distributed Sim(3) pose-graph optimization over a device mesh.

The reference's essential-graph optimization is single-threaded g2o
(reference: Optimizer::OptimizeEssentialGraph, Optimizer.cc:829-1118).
Scaling story here (SURVEY §2.5 P7): EDGES are sharded across devices on a
1-D mesh axis ``edge`` — each device evaluates residuals + autodiff
Jacobians for its edge shard and builds a partial dense normal system
[N,7,N,7]; the partials combine with ``psum`` over ICI; the (small,
replicated) dense solve and Sim3 retraction happen identically on every
device. Vertices replicate because the essential graph's vertex count is
tiny next to its edge count (covisibility edges grow ~K x covisible
neighbors).

Works on any Mesh, including the virtual CPU mesh used by tests and the
driver's multi-chip dry run.
"""
from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ..geometry import sim3
from ..optim.pose_graph import PoseGraphProblem, PoseGraphResult, _edge_residual


@lru_cache(maxsize=32)
def _build_step(mesh: Mesh, N: int, fix_scale: bool):
    edge_spec = P("edge")
    rep = P()

    def residual_wrt_updates(xi_i, xi_j, Ri, ti, si, Rj, tj, sj, mR, mt, ms):
        Ri2, ti2, si2 = sim3.retract(Ri, ti, si, xi_i)
        Rj2, tj2, sj2 = sim3.retract(Rj, tj, sj, xi_j)
        return _edge_residual(Ri2, ti2, si2, Rj2, tj2, sj2, mR, mt, ms)

    jac_fn = jax.vmap(jax.jacfwd(residual_wrt_updates, argnums=(0, 1)),
                      in_axes=(0,) * 11)
    res_fn = jax.vmap(_edge_residual)

    @jax.jit
    @partial(
        shard_map, mesh=mesh,
        in_specs=(rep, rep, rep, edge_spec, edge_spec, edge_spec, edge_spec,
                  edge_spec, edge_spec, rep, rep),
        out_specs=(rep, rep, rep, rep),
    )
    def step(Rv, tv, sv, e_i, e_j, mR, mt, ms, e_valid, v_fixed, lam):
        free = (~v_fixed).astype(Rv.dtype)
        E = e_i.shape[0]
        Ri, ti, si = Rv[e_i], tv[e_i], sv[e_i]
        Rj, tj, sj = Rv[e_j], tv[e_j], sv[e_j]
        e = res_fn(Ri, ti, si, Rj, tj, sj, mR, mt, ms)
        zeros7 = jnp.zeros((E, 7), Rv.dtype)
        Ji, Jj = jac_fn(zeros7, zeros7, Ri, ti, si, Rj, tj, sj, mR, mt, ms)
        Ji = Ji * free[e_i][:, None, None]
        Jj = Jj * free[e_j][:, None, None]
        if fix_scale:
            Ji = Ji.at[:, :, 6].set(0.0)
            Jj = Jj.at[:, :, 6].set(0.0)
        w_edge = e_valid.astype(Rv.dtype)
        wJi = Ji * w_edge[:, None, None]
        wJj = Jj * w_edge[:, None, None]
        Hii = jnp.einsum("eri,erj->eij", wJi, Ji)
        Hjj = jnp.einsum("eri,erj->eij", wJj, Jj)
        Hij = jnp.einsum("eri,erj->eij", wJi, Jj)
        bi = jnp.einsum("eri,er->ei", wJi, e)
        bj = jnp.einsum("eri,er->ei", wJj, e)
        H_part = jax.ops.segment_sum(
            jnp.concatenate([Hii, Hjj, Hij, jnp.swapaxes(Hij, -1, -2)], 0),
            jnp.concatenate([e_i * N + e_i, e_j * N + e_j,
                             e_i * N + e_j, e_j * N + e_i], 0),
            num_segments=N * N).reshape(N, N, 7, 7)
        b_part = jax.ops.segment_sum(
            jnp.concatenate([bi, bj], 0), jnp.concatenate([e_i, e_j], 0),
            num_segments=N)
        chi2_part = jnp.sum(e * e * w_edge[:, None])

        # --- combine edge-shard partial systems over ICI ---
        H = jax.lax.psum(H_part, "edge")
        b = jax.lax.psum(b_part, "edge")
        chi2 = jax.lax.psum(chi2_part, "edge")

        diag = jnp.arange(N)
        eye7 = jnp.eye(7, dtype=H.dtype)
        Hd = H.at[diag, diag].add((lam + 1e-8) * eye7)
        Hd = Hd.at[diag, diag].add(
            v_fixed.astype(H.dtype)[:, None, None] * eye7)
        if fix_scale:
            Hd = Hd.at[diag, diag].add(
                jnp.zeros((7, 7), H.dtype).at[6, 6].set(1.0))
        b = b * free[:, None]
        H_mat = Hd.transpose(0, 2, 1, 3).reshape(N * 7, N * 7)
        dxi = -jnp.linalg.solve(H_mat, b.reshape(N * 7)).reshape(N, 7)
        if fix_scale:
            dxi = dxi.at[:, 6].set(0.0)
        dxi = dxi * free[:, None]
        R_new, t_new, s_new = sim3.retract(Rv, tv, sv, dxi)
        ok = jnp.all(jnp.isfinite(dxi))
        R_new = jnp.where(ok, R_new, Rv)
        t_new = jnp.where(ok, t_new, tv)
        s_new = jnp.where(ok, s_new, sv)
        return R_new, t_new, s_new, chi2

    return step


def pose_graph_step_sharded(prob: PoseGraphProblem, mesh: Mesh,
                            lam: float = 1e-16, fix_scale: bool = False):
    """One edge-sharded Gauss-Newton step. E must divide by the mesh size.
    Returns (R, t, s, chi2_before)."""
    step = _build_step(mesh, prob.R.shape[0], fix_scale)
    return step(prob.R, prob.t, prob.s, prob.e_i, prob.e_j,
                prob.m_R, prob.m_t, prob.m_s, prob.e_valid, prob.v_fixed,
                jnp.float32(lam))


def optimize_pose_graph_sharded(prob: PoseGraphProblem, mesh: Mesh,
                                iters: int = 20,
                                fix_scale: bool = False) -> PoseGraphResult:
    """Fixed-iteration edge-sharded pose-graph optimization (the
    reference's 20 GN iterations, Optimizer.cc:1057)."""
    R, t, s = prob.R, prob.t, prob.s
    chi2 = jnp.float32(0)
    for _ in range(iters):
        R, t, s, chi2 = pose_graph_step_sharded(
            prob._replace(R=R, t=t, s=s), mesh, fix_scale=fix_scale)
    return PoseGraphResult(R, t, s, chi2)
