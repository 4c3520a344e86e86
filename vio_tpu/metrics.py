"""Trajectory evaluation: evo-compatible APE and SE3-log RMSE.

Re-derivation of the reference's evaluation path: `evo_ape tum gt est -va`
(reference: 17-vins-initialization/README.md:163-232) and the hand-rolled
SE3-log RMSE of assignment 03
(reference: 03-.../02-error-analysis/error-analysis.cpp:146-156).
"""
from __future__ import annotations

import numpy as np


def umeyama_alignment(src: np.ndarray, dst: np.ndarray, with_scale=False):
    """Least-squares rigid (or similarity) transform aligning src → dst.
    Returns (s, R, t) with dst ≈ s·R·src + t."""
    mu_s = src.mean(axis=0)
    mu_d = dst.mean(axis=0)
    xs = src - mu_s
    xd = dst - mu_d
    cov = xd.T @ xs / len(src)
    U, D, Vt = np.linalg.svd(cov)
    S = np.eye(3)
    if np.linalg.det(U) * np.linalg.det(Vt) < 0:
        S[2, 2] = -1.0
    R = U @ S @ Vt
    if with_scale:
        var_s = (xs ** 2).sum() / len(src)
        s = np.trace(np.diag(D) @ S) / var_s
    else:
        s = 1.0
    t = mu_d - s * R @ mu_s
    return s, R, t


def ape_rmse(est_p: np.ndarray, gt_p: np.ndarray, align=True,
             with_scale=False):
    """Absolute position error statistics after (optional) Umeyama
    alignment — the number evo_ape reports.  Returns dict with rmse /
    mean / median / max."""
    est_p = np.asarray(est_p)
    gt_p = np.asarray(gt_p)
    assert est_p.shape == gt_p.shape
    if align:
        s, R, t = umeyama_alignment(est_p, gt_p, with_scale)
        est_p = est_p @ (s * R).T + t
    err = np.linalg.norm(est_p - gt_p, axis=1)
    return dict(rmse=float(np.sqrt(np.mean(err ** 2))),
                mean=float(np.mean(err)),
                median=float(np.median(err)),
                max=float(np.max(err)),
                n=len(err))


def se3_log_rmse(est_R, est_p, gt_R, gt_p):
    """RMSE of ‖log(T_gt⁻¹ T_est)‖ over the trajectory (the assignment-03
    metric)."""
    from .utils import lie
    import jax.numpy as jnp
    errs = []
    for Re, pe, Rg, pg in zip(est_R, est_p, gt_R, gt_p):
        dR = Rg.T @ Re
        dp = Rg.T @ (pe - pg)
        phi = np.asarray(lie.so3_log_mat(jnp.asarray(dR)))
        errs.append(np.concatenate([dp, phi]))
    errs = np.stack(errs)
    return float(np.sqrt(np.mean(np.sum(errs ** 2, axis=1))))


def write_tum(path, ts, ps, Rs):
    """TUM-format trajectory dump (the reference's pose_output.txt,
    System.cpp:437-443)."""
    from .utils import lie
    import jax.numpy as jnp
    with open(path, "w") as f:
        for t, p, R in zip(ts, ps, Rs):
            q = np.asarray(lie.mat_to_quat(jnp.asarray(R)))
            f.write(f"{t:.9f} {p[0]:.9f} {p[1]:.9f} {p[2]:.9f} "
                    f"{q[0]:.9f} {q[1]:.9f} {q[2]:.9f} {q[3]:.9f}\n")
