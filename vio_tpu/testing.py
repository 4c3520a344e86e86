"""Self-contained window-problem builders for benchmarks, compile checks,
and sharding tests.

Builds a consistent sliding-window VIO problem directly from the analytic
simulator's closed forms (no estimator run needed): ground-truth states
at the keyframe times, exact landmark observations, and genuinely
preintegrated IMU intervals — then perturbs the states so the solver has
real work to do.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from . import factors, imu, sim
from .solver import window as W
from .utils import lie

R_BC = np.array([[0.0, 0.0, -1.0], [-1.0, 0.0, 0.0], [0.0, 1.0, 0.0]])
T_BC = np.array([0.05, 0.04, 0.03])


def make_window_problem(window_size: int = 10, max_features: int = 128,
                        imu_per_interval: int = 8, dtype=jnp.float32,
                        perturb: float = 0.01, seed: int = 0,
                        cam_dt: float = 1.0 / 30.0):
    """Returns (states, window_factors, gt_states) for a W-keyframe
    window on the simulator trajectory."""
    rng = np.random.default_rng(seed)
    W1 = window_size + 1
    cam_t = np.arange(W1) * cam_dt
    imu_hz = imu_per_interval / cam_dt
    imu_dt = 1.0 / imu_hz

    m = sim.motion_model(jnp.asarray(cam_t))
    p_wb = np.asarray(m["p_wb"])
    R_wb = np.asarray(m["R_wb"])
    v_wb = np.asarray(m["v_wb"])

    # landmarks: simulator house scene, keep those visible in all frames
    pts = sim.house_landmarks()
    R_wc = R_wb @ R_BC
    p_wc = p_wb + np.einsum("kij,j->ki", R_wb, T_BC)
    pc = np.einsum("kji,klj->kli", R_wc, pts[None] - p_wc[:, None])
    z = pc[..., 2]
    vis = (z > 0.3).all(axis=0)
    pts = pts[vis][:max_features]
    pc = pc[:, vis][:, :max_features]
    F_act = pts.shape[0]
    xy = pc[..., :2] / pc[..., 2:3]

    # preintegrate each interval from the true IMU closed form
    nd = imu.noise_diag(0.019, 0.015, 1e-4, 1e-5, dtype=dtype)
    terms_list = []
    for k in range(window_size):
        t_grid = cam_t[k] + np.arange(1, imu_per_interval + 1) * imu_dt
        mk = sim.motion_model(jnp.asarray(np.concatenate([[cam_t[k]], t_grid])))
        accs = jnp.asarray(np.asarray(mk["acc_b"])[1:], dtype)
        gyrs = jnp.asarray(np.asarray(mk["gyr_b"])[1:], dtype)
        dts = jnp.full((imu_per_interval,), imu_dt, dtype)
        st = imu.preintegrate(dts, accs, gyrs,
                              jnp.ones(imu_per_interval, bool),
                              jnp.asarray(np.asarray(mk["acc_b"])[0], dtype),
                              jnp.asarray(np.asarray(mk["gyr_b"])[0], dtype),
                              jnp.zeros(3, dtype), jnp.zeros(3, dtype), nd)
        terms_list.append(factors.ImuFactorTerms.from_state(st))
    terms = factors.ImuFactorTerms(*[
        jnp.stack([getattr(t, f) for t in terms_list])
        for f in factors.ImuFactorTerms._fields])

    # pack the reprojection grid: all features hosted by frame 0
    F = max_features
    pts_i = np.zeros((F, 3))
    pts_i[:, 2] = 1.0
    pts_j = np.zeros((F, W1, 3))
    pts_j[:, :, 2] = 1.0
    obs_mask = np.zeros((F, W1), dtype=bool)
    feat_valid = np.zeros(F, dtype=bool)
    start = np.zeros(F, dtype=np.int32)
    inv_dep_gt = np.ones(F)   # padded slots: 1.0, never 0 (1/0 → NaN Hessian)
    for i in range(F_act):
        pts_i[i, :2] = xy[0, i]
        inv_dep_gt[i] = 1.0 / pc[0, i, 2]
        feat_valid[i] = True
        for j in range(1, W1):
            pts_j[i, j, :2] = xy[j, i]
            obs_mask[i, j] = True

    P = W.num_pose_params(window_size)
    Qs_gt = np.stack([np.asarray(lie.mat_to_quat(jnp.asarray(R))) for R in R_wb])

    def mk_states(Ps, Qs, Vs, Bas, Bgs, inv_dep):
        return W.WindowStates(
            ext_t=jnp.asarray(T_BC, dtype),
            ext_q=lie.mat_to_quat(jnp.asarray(R_BC, dtype)),
            Ps=jnp.asarray(Ps, dtype), Qs=jnp.asarray(Qs, dtype),
            Vs=jnp.asarray(Vs, dtype), Bas=jnp.asarray(Bas, dtype),
            Bgs=jnp.asarray(Bgs, dtype), inv_dep=jnp.asarray(inv_dep, dtype))

    gt_states = mk_states(p_wb, Qs_gt, v_wb, np.zeros((W1, 3)),
                          np.zeros((W1, 3)), inv_dep_gt)

    # perturbed initial guess (first pose fixed = gauge anchor by prior-free LM)
    dP = perturb * rng.standard_normal((W1, 3))
    dth = perturb * rng.standard_normal((W1, 3))
    dP[0] = 0
    dth[0] = 0
    Qs0 = np.stack([
        np.asarray(lie.quat_mul(jnp.asarray(Qs_gt[k]),
                                lie.so3_exp_quat(jnp.asarray(dth[k]))))
        for k in range(W1)])
    states = mk_states(
        p_wb + dP, Qs0, v_wb + perturb * rng.standard_normal((W1, 3)),
        np.zeros((W1, 3)), np.zeros((W1, 3)),
        inv_dep_gt * (1.0 + perturb * rng.standard_normal(F)))

    wf = W.WindowFactors(
        imu_terms=terms, imu_valid=jnp.ones(window_size, bool),
        pts_i=jnp.asarray(pts_i, dtype), pts_j=jnp.asarray(pts_j, dtype),
        start=jnp.asarray(start), obs_mask=jnp.asarray(obs_mask),
        feat_valid=jnp.asarray(feat_valid),
        H_prior=jnp.zeros((P, P), dtype), b_prior=jnp.zeros(P, dtype),
        err_prior=jnp.zeros(P, dtype), Jt_prior_inv=jnp.zeros((P, P), dtype),
        g=jnp.asarray([0.0, 0.0, 9.81], dtype),
        proj_sqrt_info=jnp.asarray(460.0 / 1.5, dtype))
    return states, wf, gt_states
