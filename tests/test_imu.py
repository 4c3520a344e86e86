"""Preintegration tests: ground-truth consistency, bias Jacobian vs jacfwd.

Replaces the reference's commented-out checkJacobian
(integration_base.h:279-445) with real asserts, and ports the simulator's
IMU-integration self-check (simulator/src/imu.cpp:121 testImu)."""
import jax
import jax.numpy as jnp
import numpy as np

from vio_tpu import imu, sim
from vio_tpu.utils import lie

NOISE_D = imu.noise_diag(0.2687, 0.2121, 7.07e-6, 7.07e-7)


def make_chunk(n=20, seed=0):
    rng = np.random.default_rng(seed)
    dts = jnp.full((n,), 0.005)
    accs = jnp.asarray(rng.standard_normal((n, 3)) * 0.5 + np.array([0.1, -0.2, 9.8]))
    gyrs = jnp.asarray(rng.standard_normal((n, 3)) * 0.3)
    mask = jnp.ones((n,), bool)
    acc0 = accs[0] * 0.9
    gyr0 = gyrs[0] * 0.9
    return dts, accs, gyrs, mask, acc0, gyr0


def test_noise_free_integration_matches_ground_truth():
    """Integrating exact sim IMU between two camera frames reproduces the
    relative GT motion (the oracle for delta_p/q/v)."""
    data = sim.generate(noise=False)
    # pick frames i=30, j=31 (camera at 30 Hz, imu at 200 Hz)
    i, j = 30, 31
    ti, tj = data.cam_t[i], data.cam_t[j]
    sel = (data.imu_t > ti) & (data.imu_t <= tj + 1e-9)
    idx = np.where(sel)[0]
    # build the sample list the way the reference feeds processIMU:
    # interpolate a sample exactly at ti and tj boundaries is skipped here —
    # instead integrate from the first sample > ti with acc0 at ti (analytic).
    m0 = sim.motion_model(jnp.asarray(ti))
    dts, accs, gyrs = [], [], []
    t_prev = ti
    for k in idx:
        dts.append(data.imu_t[k] - t_prev)
        accs.append(data.acc[k])
        gyrs.append(data.gyr[k])
        t_prev = data.imu_t[k]
    if t_prev < tj - 1e-9:
        mj = sim.motion_model(jnp.asarray(tj))
        dts.append(tj - t_prev)
        accs.append(np.asarray(mj["acc_b"]))
        gyrs.append(np.asarray(mj["gyr_b"]))
    dts = jnp.asarray(dts)
    accs = jnp.asarray(np.asarray(accs))
    gyrs = jnp.asarray(np.asarray(gyrs))
    mask = jnp.ones(dts.shape, bool)
    st = imu.preintegrate(dts, accs, gyrs, mask,
                          jnp.asarray(m0["acc_b"]), jnp.asarray(m0["gyr_b"]),
                          jnp.zeros(3), jnp.zeros(3), NOISE_D)

    Ri = data.imu_R[i]
    Rj = data.imu_R[j]
    pi, pj = data.imu_p[i], data.imu_p[j]
    vi, vj = data.imu_v[i], data.imu_v[j]
    g = np.array([0.0, 0.0, 9.81])  # estimator convention: +g in evaluate
    dt = tj - ti
    # ground-truth preintegrated quantities
    gt_dq = Ri.T @ Rj
    gt_dv = Ri.T @ (vj - vi + g * dt)
    gt_dp = Ri.T @ (pj - pi - vi * dt + 0.5 * g * dt * dt)
    assert np.allclose(lie.quat_to_mat(st.delta_q), gt_dq, atol=5e-6)
    assert np.allclose(st.delta_v, gt_dv, atol=5e-5)
    assert np.allclose(st.delta_p, gt_dp, atol=5e-6)


def test_bias_jacobian_matches_jacfwd():
    """The F-chain bias Jacobian blocks match autodiff of the integrator.

    The stored Jacobian is the reference's first-order F-chain
    (integration_base.h:124) — it approximates the exact derivative of the
    discrete midpoint integrator with O(dt·ω) per-step linearization error,
    so we assert agreement to ~1% relative."""
    dts, accs, gyrs, mask, acc0, gyr0 = make_chunk(n=10)

    def integrate(ba, bg):
        return imu.preintegrate(dts, accs, gyrs, mask, acc0, gyr0, ba, bg, NOISE_D)

    ba0 = jnp.zeros(3)
    bg0 = jnp.zeros(3)
    st = integrate(ba0, bg0)

    def f_all(bab):
        s = integrate(bab[:3], bab[3:])
        dq_local = 2.0 * lie.quat_mul(lie.quat_conj(st.delta_q), s.delta_q)[:3]
        return jnp.concatenate([s.delta_p, dq_local, s.delta_v])

    Jad = jax.jacfwd(f_all)(jnp.zeros(6))  # (9, 6): rows p,q,v; cols ba,bg
    J = st.jacobian

    def close(a, b, tol=0.02):
        return np.allclose(a, b, rtol=tol, atol=tol * 0.005 + 1e-9)

    assert close(J[0:3, 9:12], Jad[0:3, 0:3])    # dp/dba
    assert close(J[0:3, 12:15], Jad[0:3, 3:6])   # dp/dbg
    assert close(J[3:6, 12:15], Jad[3:6, 3:6])   # dq/dbg
    assert close(J[6:9, 9:12], Jad[6:9, 0:3])    # dv/dba
    assert close(J[6:9, 12:15], Jad[6:9, 3:6])   # dv/dbg


def test_masked_scan_equals_truncated():
    dts, accs, gyrs, mask, acc0, gyr0 = make_chunk(n=20)
    n_valid = 13
    mask = jnp.arange(20) < n_valid
    st_masked = imu.preintegrate(dts, accs, gyrs, mask, acc0, gyr0,
                                 jnp.zeros(3), jnp.zeros(3), NOISE_D)
    st_trunc = imu.preintegrate(dts[:n_valid], accs[:n_valid], gyrs[:n_valid],
                                jnp.ones((n_valid,), bool), acc0, gyr0,
                                jnp.zeros(3), jnp.zeros(3), NOISE_D)
    assert np.allclose(st_masked.delta_p, st_trunc.delta_p)
    assert np.allclose(st_masked.delta_q, st_trunc.delta_q)
    assert np.allclose(st_masked.covariance, st_trunc.covariance)
    assert np.isclose(st_masked.sum_dt, st_trunc.sum_dt)


def test_evaluate_zero_residual_on_ground_truth():
    """Residual is ~0 when states equal ground truth and biases are zero."""
    data = sim.generate(noise=False)
    i, j = 10, 11
    ti, tj = data.cam_t[i], data.cam_t[j]
    sel = np.where((data.imu_t > ti) & (data.imu_t <= tj + 1e-9))[0]
    m0 = sim.motion_model(jnp.asarray(ti))
    dts = [data.imu_t[sel[0]] - ti] + list(np.diff(data.imu_t[sel]))
    accs = data.acc[sel]
    gyrs = data.gyr[sel]
    if data.imu_t[sel[-1]] < tj - 1e-9:
        mj = sim.motion_model(jnp.asarray(tj))
        dts.append(tj - data.imu_t[sel[-1]])
        accs = np.vstack([accs, np.asarray(mj["acc_b"])])
        gyrs = np.vstack([gyrs, np.asarray(mj["gyr_b"])])
    st = imu.preintegrate(jnp.asarray(dts), jnp.asarray(accs), jnp.asarray(gyrs),
                          jnp.ones((len(dts),), bool),
                          jnp.asarray(m0["acc_b"]), jnp.asarray(m0["gyr_b"]),
                          jnp.zeros(3), jnp.zeros(3), NOISE_D)
    g = jnp.asarray([0.0, 0.0, 9.81])
    qi = lie.mat_to_quat(jnp.asarray(data.imu_R[i]))
    qj = lie.mat_to_quat(jnp.asarray(data.imu_R[j]))
    r = imu.evaluate(st, g,
                     jnp.asarray(data.imu_p[i]), qi, jnp.asarray(data.imu_v[i]),
                     jnp.zeros(3), jnp.zeros(3),
                     jnp.asarray(data.imu_p[j]), qj, jnp.asarray(data.imu_v[j]),
                     jnp.zeros(3), jnp.zeros(3))
    assert np.linalg.norm(r) < 2e-4


def test_vmap_batch_preintegration():
    dts, accs, gyrs, mask, acc0, gyr0 = make_chunk()
    W = 4
    batch = lambda x: jnp.broadcast_to(x, (W,) + x.shape)
    st = imu.preintegrate_batch(batch(dts), batch(accs), batch(gyrs), batch(mask),
                                batch(acc0), batch(gyr0),
                                jnp.zeros((W, 3)), jnp.zeros((W, 3)), NOISE_D)
    assert st.delta_p.shape == (W, 3)
    single = imu.preintegrate(dts, accs, gyrs, mask, acc0, gyr0,
                              jnp.zeros(3), jnp.zeros(3), NOISE_D)
    assert np.allclose(st.delta_p[0], single.delta_p)


def test_covariance_matches_monte_carlo_with_shared_sample_noise():
    """The preintegration covariance must match the EMPIRICAL spread of
    noisy integrations.  Consecutive midpoint steps share the boundary
    IMU sample; the reference's independent-noise model
    (integration_base.h:54-128) understates the white-noise covariance by
    ~2x — the round-5 correlated-noise recursion (imu.midpoint_step X
    carry) makes the model exact.  4000-realization Monte Carlo must land
    within 10% on the p and v blocks."""
    rng = np.random.default_rng(0)
    dt = 0.005
    n = 8
    R = 4000
    acc_n, gyr_n = 0.2687, 0.2121
    noise_d = imu.noise_diag(acc_n, gyr_n, 1e-9, 1e-9)

    acc_true = np.tile(np.array([0.3, -0.2, 9.9]), (n + 1, 1))
    gyr_true = np.tile(np.array([0.2, 0.1, -0.3]), (n + 1, 1))
    dts = jnp.full((n,), dt)
    mask = jnp.ones(n, bool)
    z3 = jnp.zeros(3)

    def pre(acc_s, gyr_s):
        return imu.preintegrate(dts, acc_s[1:], gyr_s[1:], mask,
                                acc_s[0], gyr_s[0], z3, z3, noise_d)

    st0 = pre(jnp.asarray(acc_true), jnp.asarray(gyr_true))
    accs = jnp.asarray(acc_true[None] +
                       acc_n * rng.standard_normal((R, n + 1, 3)))
    gyrs = jnp.asarray(gyr_true[None] +
                       gyr_n * rng.standard_normal((R, n + 1, 3)))
    sts = jax.jit(jax.vmap(pre))(accs, gyrs)
    dp = np.asarray(sts.delta_p) - np.asarray(st0.delta_p)
    dv = np.asarray(sts.delta_v) - np.asarray(st0.delta_v)
    mod = np.asarray(st0.covariance)
    ratio_p = np.trace(np.cov(dp.T)) / np.trace(mod[0:3, 0:3])
    ratio_v = np.trace(np.cov(dv.T)) / np.trace(mod[6:9, 6:9])
    assert abs(ratio_p - 1.0) < 0.1, ratio_p
    assert abs(ratio_v - 1.0) < 0.1, ratio_v
