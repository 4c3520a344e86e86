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


# ---------------------------------------------------------------------------
# Global (large-window) BA problems — shared by tests/test_global_ba.py,
# the sharding tests, and bench.py
# ---------------------------------------------------------------------------

def make_global_problem(N: int = 12, M: int = 120, obs_per_lm: int = 6,
                        seed: int = 0, dtype=jnp.float64, pad_obs_to: int = 8):
    """Keyframes on an arc around a landmark cloud; every landmark observed
    in its host frame + obs_per_lm later frames.  Returns (GlobalBA, pts)."""
    import jax
    from .parallel import global_ba

    rng = np.random.default_rng(seed)
    Ps, Qs = [], []
    for k in range(N):
        ang = 1.4 * k / N          # ~1.4 rad total arc regardless of N
        Ps.append([4.0 * np.sin(ang), 4.0 - 4.0 * np.cos(ang),
                   0.3 * np.sin(0.5 * k)])
        Qs.append(np.asarray(lie.so3_exp_quat(jnp.asarray(
            [0.02 * np.sin(k), 0.02 * np.cos(k), ang]))))
    Ps = np.asarray(Ps)
    Qs = np.asarray(Qs)

    # cameras look along +z; the landmark cloud sits in front at z ∈ [6, 14]
    pts = np.stack([rng.uniform(-3, 9, M), rng.uniform(-2, 6, M),
                    rng.uniform(6, 14, M)], axis=1)

    host = (np.arange(M) % (N - obs_per_lm)).astype(np.int32)
    Rs = np.stack([np.asarray(lie.quat_to_mat(jnp.asarray(q))) for q in Qs])
    Xc_all = np.einsum("kji,kmj->kmi", Rs,
                       pts[None, :, :] - Ps[:, None, :])      # (N, M, 3)
    good = ((Xc_all[..., 2] > 1.0) &
            (np.abs(Xc_all[..., 0] / Xc_all[..., 2]) <= 2) &
            (np.abs(Xc_all[..., 1] / Xc_all[..., 2]) <= 2))    # (N, M)

    lm_valid = good[host, np.arange(M)]
    Xh = Xc_all[host, np.arange(M)]                            # (M, 3)
    inv_dep = np.where(lm_valid, 1.0 / np.maximum(Xh[:, 2], 1e-6), 1.0)
    bearing0 = np.where(lm_valid[:, None],
                        Xh / np.maximum(Xh[:, 2:3], 1e-6),
                        np.array([0.0, 0.0, 1.0]))

    offs = np.arange(1, obs_per_lm + 1)
    fr = host[None, :] + offs[:, None]                         # (K, M)
    ok = (fr < N) & lm_valid[None, :] & good[np.minimum(fr, N - 1),
                                             np.arange(M)[None, :]]
    ks, ms = np.nonzero(ok)
    frame = list(fr[ks, ms].astype(np.int32))
    lm_idx = list(ms.astype(np.int32))
    Xj = Xc_all[fr[ks, ms], ms]
    bearing = list(Xj / Xj[:, 2:3])

    O = len(lm_idx)
    pad = (-O) % pad_obs_to
    lm_idx += [0] * pad
    frame += [int(host[0])] * pad       # host == frame → masked out
    bearing += [bearing[0]] * pad
    valid = np.asarray([True] * O + [False] * pad)

    p = global_ba.GlobalBA(
        Ps=jnp.asarray(Ps, dtype), Qs=jnp.asarray(Qs, dtype),
        inv_dep=jnp.asarray(inv_dep, dtype),
        host=jnp.asarray(host), bearing0=jnp.asarray(bearing0, dtype),
        lm_valid=jnp.asarray(lm_valid),
        lm_idx=jnp.asarray(lm_idx, jnp.int32),
        frame=jnp.asarray(frame, jnp.int32),
        bearing=jnp.asarray(np.asarray(bearing), dtype),
        valid=jnp.asarray(valid),
        sqrt_info=jnp.asarray(460.0 / 1.5, dtype))
    return p, pts


def perturb_global(p, seed=1, pose_sigma=0.03, rot_sigma=0.01,
                   dep_sigma=0.05, fix_frames=2):
    """Perturb a GlobalBA problem away from its ground truth."""
    import jax
    rng = np.random.default_rng(seed)
    N = p.Ps.shape[0]
    mask = (np.arange(N) >= fix_frames)[:, None]
    dP = pose_sigma * rng.standard_normal((N, 3)) * mask
    dth = rot_sigma * rng.standard_normal((N, 3)) * mask
    Qs = lie.quat_normalize(jax.vmap(lie.quat_mul)(
        p.Qs, jax.vmap(lie.so3_exp_quat)(jnp.asarray(dth))))
    rel = 1.0 + dep_sigma * rng.standard_normal(p.inv_dep.shape[0])
    return p._replace(Ps=p.Ps + jnp.asarray(dP), Qs=Qs,
                      inv_dep=p.inv_dep * jnp.asarray(rel))
