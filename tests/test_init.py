"""Initialization-stack tests: triangulation, PnP, relative pose, global
SfM, gyro-bias / linear alignment, and hand-eye extrinsic rotation —
the reference's initial/* capabilities driven by the analytic simulator
(reference: vins-mono/src/initial/*, test strategy per SURVEY.md §4)."""
import jax
import jax.numpy as jnp
import numpy as np

from vio_tpu import imu, sim
from vio_tpu.init import alignment, ex_rotation, sfm
from vio_tpu.utils import lie


def _random_scene(seed=0, n_pts=40, n_frames=4):
    rng = np.random.default_rng(seed)
    pts = np.stack([rng.uniform(-3, 3, n_pts), rng.uniform(-3, 3, n_pts),
                    rng.uniform(6, 12, n_pts)], axis=1)
    Rs, ts = [], []
    for k in range(n_frames):
        th = 0.08 * k * np.array([0.3, 1.0, 0.2])
        R = np.asarray(lie.so3_exp_mat(jnp.asarray(th)))
        t = np.array([0.4 * k, -0.2 * k, 0.1 * k])
        Rs.append(R)
        ts.append(t)
    Rs = np.stack(Rs)
    ts = np.stack(ts)
    obs = np.einsum("kij,lj->kli", Rs, pts) + ts[:, None, :]
    obs = obs[..., :2] / obs[..., 2:3]
    return pts, Rs, ts, obs


def test_triangulate_dlt_exact():
    pts, Rs, ts, obs = _random_scene()
    X, ratio = sfm.triangulate_dlt_batch(jnp.asarray(Rs), jnp.asarray(ts),
                                         jnp.asarray(obs.transpose(1, 0, 2)),
                                         jnp.ones((pts.shape[0], 4), bool))
    assert np.allclose(np.asarray(X), pts, atol=1e-9)
    assert np.all(np.asarray(ratio) > 1e3)   # noise-free → huge sv gap


def test_pnp_gn_recovers_pose():
    pts, Rs, ts, obs = _random_scene()
    k = 2
    R0 = Rs[k] @ np.asarray(lie.so3_exp_mat(jnp.asarray([0.05, -0.04, 0.06])))
    t0 = ts[k] + np.array([0.2, -0.1, 0.15])
    R, t, msq = sfm.pnp_gn(jnp.asarray(pts), jnp.asarray(obs[k]),
                           jnp.ones(len(pts), bool),
                           jnp.asarray(R0), jnp.asarray(t0))
    assert float(msq) < 1e-16
    assert np.allclose(np.asarray(R), Rs[k], atol=1e-7)
    assert np.allclose(np.asarray(t), ts[k], atol=1e-7)


def test_relative_pose_convention():
    """solve_relative_rt returns pose of frame1 in frame0 coordinates."""
    pts, Rs, ts, obs = _random_scene(n_frames=2)
    ok, R01, t01 = sfm.solve_relative_rt(obs[0], obs[1],
                                         np.ones(len(pts), bool))
    assert ok
    # GT: x0 = R01 x1 + t01 with x_k = Rs[k] X + ts[k]
    R01_gt = Rs[0] @ Rs[1].T
    t01_gt = ts[0] - R01_gt @ ts[1]
    assert np.allclose(R01, R01_gt, atol=1e-6)
    t_dir = t01 / np.linalg.norm(t01)
    t_gt_dir = t01_gt / np.linalg.norm(t01_gt)
    assert np.allclose(np.abs(t_dir @ t_gt_dir), 1.0, atol=1e-6)
    # cheirality should also fix the sign
    assert t_dir @ t_gt_dir > 0.999


def test_global_sfm_construct():
    pts, Rs, ts, obs = _random_scene(n_frames=6, n_pts=50)
    K = 6
    valid = np.ones((K, len(pts)), bool)
    l = 0
    # pose of frame K-1 in frame-l coordinates (x_l = R X + t)
    R_rel = Rs[l] @ Rs[K - 1].T
    t_rel = ts[l] - R_rel @ ts[K - 1]
    ok, Rs_e, ts_e, X, tri = sfm.construct(obs, valid, l, R_rel, t_rel)
    assert ok
    assert tri.sum() == len(pts)
    # frame l is the anchor: estimated poses are relative to camera l, so
    # compare against GT re-expressed in frame l (same scale: t_rel was metric)
    for k in range(K):
        R_gt = Rs[k] @ Rs[l].T
        t_gt = ts[k] - R_gt @ ts[l]
        assert np.allclose(Rs_e[k], R_gt, atol=1e-5), k
        assert np.allclose(ts_e[k], t_gt, atol=1e-4), k


def _window_preints(data, cfg_noise, frames):
    """Preintegrate between consecutive sim camera frames (with boundary
    interpolation) at zero bias."""
    nd = imu.noise_diag(*cfg_noise)
    out = []
    for a, b in zip(frames[:-1], frames[1:]):
        t0, t1 = data.cam_t[a], data.cam_t[b]
        sel = np.where((data.imu_t > t0) & (data.imu_t <= t1))[0]
        ts = list(data.imu_t[sel])
        accs = [data.acc[i] for i in sel]
        gyrs = [data.gyr[i] for i in sel]
        nxt = sel[-1] + 1
        if ts[-1] < t1 and nxt < len(data.imu_t):
            w = (t1 - ts[-1]) / (data.imu_t[nxt] - ts[-1])
            accs.append((1 - w) * data.acc[sel[-1]] + w * data.acc[nxt])
            gyrs.append((1 - w) * data.gyr[sel[-1]] + w * data.gyr[nxt])
            ts.append(t1)
        dts = jnp.asarray(np.diff(np.concatenate([[t0], ts])))
        i0 = sel[0] - 1
        st = imu.preintegrate(dts, jnp.asarray(np.stack(accs)),
                              jnp.asarray(np.stack(gyrs)),
                              jnp.ones(len(ts), bool),
                              jnp.asarray(data.acc[i0]),
                              jnp.asarray(data.gyr[i0]),
                              jnp.zeros(3), jnp.zeros(3), nd)
        out.append(st)
    return out


def test_gyro_bias_recovery():
    """Corrupt the gyro with a constant bias; the LS solve recovers it."""
    data = sim.generate(noise=False)
    bias = np.array([0.02, -0.015, 0.01])
    data.gyr += bias
    frames = list(range(0, 11))
    sts = _window_preints(data, (0.019, 0.015, 1e-4, 1e-5), frames)
    R = data.imu_R[frames]                      # body→world = body→"c0"
    delta_q = np.stack([np.asarray(s.delta_q) for s in sts])
    dq_dbg = np.stack([np.asarray(s.jacobian)[3:6, 12:15] for s in sts])
    dbg = np.asarray(alignment.solve_gyroscope_bias(R, delta_q, dq_dbg))
    assert np.allclose(dbg, bias, atol=2e-4), dbg


def test_linear_alignment_recovers_scale_gravity_velocity():
    data = sim.generate(noise=False)
    frames = list(range(0, 11))
    sts = _window_preints(data, (0.019, 0.015, 1e-4, 1e-5), frames)
    R_wb = data.imu_R[frames]
    s_true = 2.5                                # visual scale factor
    tic = np.array([0.05, 0.04, 0.03])
    T_cam = data.cam_p[frames] / s_true         # camera positions, descaled
    delta_p = np.stack([np.asarray(s.delta_p) for s in sts])
    delta_v = np.stack([np.asarray(s.delta_v) for s in sts])
    dts = np.array([float(s.sum_dt) for s in sts])
    ok, x, g, s = alignment.linear_alignment(R_wb, T_cam, delta_p, delta_v,
                                             dts, tic)
    assert ok
    assert abs(s - s_true) < 0.01 * s_true, s
    # the solved g follows the reference's sign convention: it is the +G
    # vector (the one entering evaluate() as +0.5·G·dt², estimator G=(0,0,9.8))
    assert np.allclose(g, [0, 0, 9.81], atol=0.05), g
    # x holds body-frame velocities: v_world = R_wb @ v_body
    v0_world = R_wb[0] @ x[0:3]
    assert np.allclose(v0_world, data.imu_v[0], atol=0.05)


def test_extrinsic_rotation_calibration():
    rng = np.random.default_rng(7)
    R_bc = np.array([[0.0, 0.0, -1.0], [-1.0, 0.0, 0.0], [0.0, 1.0, 0.0]])
    calib = ex_rotation.ExtrinsicRotationCalibrator(window_size=10)
    for _ in range(12):
        th = rng.uniform(-0.3, 0.3, 3)
        R_imu = np.asarray(lie.so3_exp_mat(jnp.asarray(th)))
        R_cam = R_bc.T @ R_imu @ R_bc           # q_cam = q_cb q_imu q_cb⁻¹
        calib.add_pair(R_cam, R_imu)
    ok, ric = calib.solve()
    assert ok
    assert np.allclose(ric, R_bc, atol=1e-8) or \
        np.allclose(ric, -R_bc, atol=1e-8)
