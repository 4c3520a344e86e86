"""Simulator self-checks (reference: simulator/src/imu.cpp:121 testImu)."""
import jax.numpy as jnp
import numpy as np

from vio_tpu import sim
from vio_tpu.utils import lie


def test_motion_model_derivative_consistency():
    """Velocity/acceleration from the closed form match finite differences
    of the position, and gyro matches dR/dt."""
    t = jnp.asarray(5.3)
    eps = 1e-6
    m = sim.motion_model(t)
    mp = sim.motion_model(t + eps)
    mm = sim.motion_model(t - eps)
    v_fd = (mp["p_wb"] - mm["p_wb"]) / (2 * eps)
    assert np.allclose(m["v_wb"], v_fd, atol=1e-6)
    # accel: a = R^T (ddp - g); check ddp via velocity FD
    a_fd = (mp["v_wb"] - mm["v_wb"]) / (2 * eps)
    ddp = np.asarray(m["R_wb"]) @ np.asarray(m["acc_b"]) + sim.GRAVITY_W
    assert np.allclose(ddp, a_fd, atol=1e-5)
    # gyro: R^T dR/dt = [w]x
    dR = (np.asarray(mp["R_wb"]) - np.asarray(mm["R_wb"])) / (2 * eps)
    what = np.asarray(m["R_wb"]).T @ dR
    w = np.array([what[2, 1], what[0, 2], what[1, 0]])
    assert np.allclose(w, m["gyr_b"], atol=1e-6)


def test_euler_integration_self_check():
    """Integrating the noise-free IMU stream reproduces the trajectory —
    the simulator's own testImu validation, with midpoint integration."""
    import jax

    data = sim.generate(noise=False)
    dt = 1.0 / 200
    m0 = sim.motion_model(jnp.asarray(0.0))
    q0 = lie.mat_to_quat(m0["R_wb"])
    N = 400  # 2 seconds

    def step(carry, inp):
        p, v, q = carry
        acc_prev, acc_cur, gyr_mid = inp
        g = jnp.asarray(sim.GRAVITY_W)
        acc0_w = lie.quat_rotate(q, acc_prev) + g
        q = lie.quat_normalize(lie.quat_mul(q, lie.so3_exp_quat(gyr_mid * dt)))
        acc1_w = lie.quat_rotate(q, acc_cur) + g
        acc_w = 0.5 * (acc0_w + acc1_w)
        p = p + v * dt + 0.5 * acc_w * dt * dt
        v = v + acc_w * dt
        return (p, v, q), None

    inputs = (jnp.asarray(data.acc[:N - 1]), jnp.asarray(data.acc[1:N]),
              jnp.asarray(0.5 * (data.gyr[:N - 1] + data.gyr[1:N])))
    (p, v, _), _ = jax.lax.scan(step, (m0["p_wb"], m0["v_wb"], q0), inputs)
    t_end = (N - 1) * dt
    gt = sim.motion_model(jnp.asarray(t_end))
    assert np.linalg.norm(p - np.asarray(gt["p_wb"])) < 2e-3
    assert np.linalg.norm(v - np.asarray(gt["v_wb"])) < 2e-3


def test_projection_consistency():
    """Stored normalized observations re-project from GT camera poses."""
    data = sim.generate(noise=False)
    m, l = 17, 5
    if not data.obs_valid[m, l]:
        idx = np.argwhere(data.obs_valid)
        m, l = idx[0]
    pw = data.landmarks[l]
    pc = data.cam_R[m].T @ (pw - data.cam_p[m])
    assert pc[2] > 0
    assert np.allclose(pc[:2] / pc[2], data.obs_xy[m, l], atol=1e-12)


def test_landmark_visibility_reasonable():
    data = sim.generate(noise=False)
    per_frame = data.obs_valid.sum(axis=1)
    # every frame should see a healthy number of landmarks
    assert per_frame.min() >= 10
    assert data.landmarks.shape[0] >= 30
