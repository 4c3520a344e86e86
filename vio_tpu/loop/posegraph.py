"""SE3 pose-graph optimization on the LM solver.

The reference reads pose-graph config flags but never compiles a
pose-graph node (reference: config/euroc_config.yaml:66-70 loop_closure /
pose_graph_save_path read at parameters.cpp but unused; relocalization
plumbing exists at estimator.cpp:622-642).  The north-star capability list
(BASELINE.json) requires loop closing for real, so this implements it:
sequential odometry edges + loop edges, residual log(ΔT_meas⁻¹·Ti⁻¹Tj),
solved with the generic LM solver over batched vmapped residuals.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..solver import generic
from ..utils import lie


def se3_edge_residual(Pi, qi, Pj, qj, dP, dq):
    """6-dim residual of one relative-pose edge: [dθ, dp]."""
    q_ij = lie.quat_mul(lie.quat_conj(qi), qj)
    p_ij = lie.quat_rotate(lie.quat_conj(qi), Pj - Pi)
    r_rot = lie.quat_log(lie.quat_mul(lie.quat_conj(dq), q_ij))
    r_t = p_ij - dP
    return jnp.concatenate([r_rot, r_t])


def optimize(Ps0, qs0, edges_i, edges_j, edges_dP, edges_dq,
             edge_weights=None, fix_first: bool = True,
             max_iter: int = 50):
    """Optimize N poses given M relative edges.

    Ps0 (N,3), qs0 (N,4) initial guesses; edges_* (M,)/(M,3)/(M,4).
    Returns (Ps, qs, stats).  Parameterization: local [dθ(3), dp(3)] per
    pose around the initial guess, accumulated multiplicatively."""
    N = Ps0.shape[0]
    Ps0 = jnp.asarray(Ps0)
    qs0 = jnp.asarray(qs0)
    ei = jnp.asarray(edges_i)
    ej = jnp.asarray(edges_j)
    dP = jnp.asarray(edges_dP)
    dq = jnp.asarray(edges_dq)
    w = jnp.ones(len(edges_i)) if edge_weights is None \
        else jnp.asarray(edge_weights)
    free = jnp.asarray([0.0 if (fix_first and k == 0) else 1.0
                        for k in range(N)])

    def unpack(x):
        d = x.reshape(N, 6) * free[:, None]
        qs = lie.quat_mul(qs0, lie.so3_exp_quat(d[:, 0:3]))
        Ps = Ps0 + d[:, 3:6]
        return Ps, qs

    def residuals(x):
        Ps, qs = unpack(x)
        r = jax.vmap(se3_edge_residual)(Ps[ei], qs[ei], Ps[ej], qs[ej],
                                        dP, dq)
        return (r * w[:, None]).reshape(-1)

    @jax.jit
    def normal_fn(x):
        r = residuals(x)
        J = jax.jacfwd(residuals)(x)
        return J.T @ J, -J.T @ r, 0.5 * jnp.sum(r * r)

    @jax.jit
    def chi2_fn(x):
        r = residuals(x)
        return 0.5 * jnp.sum(r * r)

    x, stats = generic.lm_solve_dense(normal_fn, chi2_fn,
                                      lambda a, d: a + d,
                                      jnp.zeros(6 * N), max_iter=max_iter)
    Ps, qs = unpack(jnp.asarray(x))
    return np.asarray(Ps), np.asarray(qs), stats
