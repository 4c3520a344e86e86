"""Marginalization of evicted keyframes into an eigendecomposed Hessian prior.

Re-derivation of Problem::Marginalize
(reference: vins-mono/src/backend/problem.cc:617-795): build the Hessian over
the marg frame's factors, Schur-eliminate its landmarks, fold the old prior,
permute the marginalized pose+speedbias block to the bottom-right, eliminate
it with an eigh-based pseudo-inverse (eps=1e-8), and recover the sqrt-form
(Jt_prior_inv, err_prior) via the eigenvalue square root.

All permutations are static gathers (the marg block position is fixed by the
window policy), so everything jits with fixed shapes.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from . import window as W

EPS = 1e-8


def _eigh_schur(H, b, n_keep):
    """Eliminate the trailing block of H (rows/cols n_keep:) with the
    eigendecomposed pseudo-inverse (problem.cc:747-764)."""
    Amm = 0.5 * (H[n_keep:, n_keep:] + H[n_keep:, n_keep:].T)
    w, V = jnp.linalg.eigh(Amm)
    w_inv = jnp.where(w > EPS, 1.0 / jnp.where(w > EPS, w, 1.0), 0.0)
    Amm_inv = (V * w_inv[None, :]) @ V.T
    Arm = H[:n_keep, n_keep:]
    tempB = Arm @ Amm_inv
    H_new = H[:n_keep, :n_keep] - tempB @ H[n_keep:, :n_keep]
    b_new = b[:n_keep] - tempB @ b[n_keep:]
    return H_new, b_new


def _sqrt_form(H, b):
    """(Jt_prior_inv, err_prior, H_clean) via eigh square-root
    (problem.cc:766-779)."""
    w, V = jnp.linalg.eigh(H)
    S = jnp.where(w > EPS, w, 0.0)
    S_inv = jnp.where(w > EPS, 1.0 / jnp.where(w > EPS, w, 1.0), 0.0)
    Jt_inv = jnp.sqrt(S_inv)[:, None] * V.T
    err = -(Jt_inv @ b)
    J = jnp.sqrt(S)[:, None] * V.T
    H_clean = J.T @ J
    H_clean = jnp.where(jnp.abs(H_clean) > 1e-9, H_clean, 0.0)
    return Jt_inv, err, H_clean


def _finalize(H_perm, b_perm, P):
    """Eliminate the trailing 15-dim marg block, then zero-pad everything
    back to the static size P (the reference's ExtendHessiansPriorSize(15)
    at the next solve, problem.cc:82-91)."""
    n_keep = P - 15
    H_new, b_new = _eigh_schur(H_perm, b_perm, n_keep)
    Jt_inv, err, H_clean = _sqrt_form(H_new, b_new)
    Hp = jnp.zeros((P, P), H_new.dtype).at[:n_keep, :n_keep].set(H_clean)
    bp = jnp.zeros((P,), b_new.dtype).at[:n_keep].set(b_new)
    errp = jnp.zeros((P,), b_new.dtype).at[:n_keep].set(err)
    Jtp = jnp.zeros((P, P), H_new.dtype).at[:n_keep, :n_keep].set(Jt_inv)
    return Hp, bp, errp, Jtp


def _perm_drop_frame(P: int, k: int):
    """Permutation moving frame k's 15-dim block to the end (static)."""
    i0 = 6 + 15 * k
    idx = list(range(0, i0)) + list(range(i0 + 15, P)) + list(range(i0, i0 + 15))
    return jnp.asarray(idx, jnp.int32)


@partial(jax.jit, static_argnames=("loss_delta",))
def marginalize_old(states: W.WindowStates, f: W.WindowFactors,
                    loss_delta: float = 1.0):
    """Marginalize frame 0 (MargOldFrame, estimator.cpp:693-829):
    factors = IMU interval 0 + all observations of landmarks hosted by
    frame 0 (Cauchy loss); landmarks Schur-eliminated; prior folded; frame-0
    pose+speedbias eliminated.  Returns (H_prior, b_prior, err_prior,
    Jt_prior_inv) zero-padded to the static pose-param size."""
    W1 = states.Ps.shape[0]
    P = W.num_pose_params(W1 - 1)

    marg_feat = jnp.logical_and(f.feat_valid, f.start == 0)
    f_marg = f._replace(
        feat_valid=marg_feat,
        imu_valid=jnp.logical_and(
            f.imu_valid, jnp.arange(W1 - 1) == 0),
    )
    # assemble WITHOUT fixed-vertex zeroing (Marginalize has none); the prior
    # fold inside assemble matches problem.cc:711-715 since the prior is
    # additive to the pose block only.
    n = W.assemble(states, f_marg, fix_ext=False, loss_delta=loss_delta)

    # landmark Schur (problem.cc:686-708)
    Hmm_inv = jnp.where(jnp.abs(n.Hmm) > 1e-30, 1.0 / n.Hmm, 0.0)
    Hmm_inv = jnp.where(marg_feat, Hmm_inv, 0.0)
    tempH = n.Hpm * Hmm_inv[None, :]
    Hpp = n.Hpp - tempH @ n.Hpm.T
    bp = n.bp - tempH @ n.bm

    perm = _perm_drop_frame(P, 0)
    H_perm = Hpp[perm][:, perm]
    b_perm = bp[perm]
    return _finalize(H_perm, b_perm, P)


@jax.jit
def marginalize_new(f: W.WindowFactors):
    """Marginalize frame W-1 out of the prior only (MargNewFrame,
    estimator.cpp:830-901 — the problem there contains no edges).  The
    window size is recovered from the prior's static shape."""
    P = f.H_prior.shape[0]
    W1 = (P - 6) // 15
    perm = _perm_drop_frame(P, W1 - 2)
    H_perm = f.H_prior[perm][:, perm]
    b_perm = f.b_prior[perm]
    return _finalize(H_perm, b_perm, P)
