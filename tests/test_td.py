"""Camera-IMU time offset (td) handling.

The reference reads TD from config and pairs IMU against img_t + td
(reference: vins-mono/src/parameters.cpp:52-211 readParameters TD;
estimator consumes measurements at the shifted camera time).  Here the
playback drivers apply cfg.td to every camera timestamp before IMU
pairing (runner.py), so a camera stream whose clock lags the IMU clock
is re-aligned by configuring td.
"""
import dataclasses

import numpy as np

from vio_tpu import metrics, runner, sim
from vio_tpu.config import sim_config

TD = 0.012   # 12 ms camera clock lag (t_imu = t_cam + td)
N = 150


def _run(td_cfg):
    data = sim.generate(noise=False)
    # camera stamps reported on a clock that lags the IMU clock by TD;
    # images/observations themselves are unchanged
    lagged = dataclasses.replace(data, cam_t=data.cam_t - TD)
    cfg = sim_config(td=td_cfg)
    est, traj = runner.run_sim(lagged, cfg=cfg, n_frames=N)
    assert est.initialized
    # GT at the TRUE exposure times (the original camera timeline)
    gt_p, _ = runner.sim_ground_truth_at(data, np.asarray(traj["t"]) + (TD - td_cfg))
    return metrics.ape_rmse(traj["p"], gt_p)["rmse"]


def test_td_compensates_camera_clock_offset():
    ape_fixed = _run(TD)      # td configured: pairing re-aligned
    ape_broken = _run(0.0)    # td ignored: IMU mis-paired by 12 ms
    assert ape_fixed < 0.05, ape_fixed
    assert ape_fixed < 0.5 * ape_broken, (ape_fixed, ape_broken)


def _run_online_td(estimate: bool, true_td: float, n: int):
    """Bypass stream with REAL normalized-plane velocities (finite
    differences of the exact observations) and a camera clock that lags
    the IMU clock by true_td; the estimator starts from td=0."""
    from vio_tpu.estimator import Estimator

    data = sim.generate(noise=False)
    lagged = dataclasses.replace(data, cam_t=data.cam_t - true_td)
    est = Estimator(sim_config(td=0.0, estimate_td=estimate))
    imu_i = 0
    t_prev = lagged.cam_t[0] + est.td
    ts, ps = [], []
    for k in range(n):
        t = lagged.cam_t[k] + est.td       # live offset, like the drivers
        if k:
            imu_i = runner.feed_interval(est, data.imu_t, data.acc,
                                         data.gyr, t_prev, t, imu_i)
        t_prev = t
        feats = {}
        dt = data.cam_t[k] - data.cam_t[k - 1] if k else 1.0
        for lid in np.where(data.obs_valid[k])[0]:
            xy = data.obs_xy[k, lid]
            vel = ((xy - data.obs_xy[k - 1, lid]) / dt
                   if k and data.obs_valid[k - 1, lid] else np.zeros(2))
            feats[int(lid)] = (np.array([xy[0], xy[1], 1.0]),
                               data.obs_uv[k, lid], vel)
        est.process_image(feats, t)
        if est.initialized:
            tt, p, _R = est.latest_pose()
            ts.append(tt)
            ps.append(p)
    gt_p, _ = runner.sim_ground_truth_at(data,
                                         np.asarray(ts) + (true_td - est.td))
    ape = metrics.ape_rmse(np.asarray(ps), gt_p)["rmse"]
    return est, ape


def test_online_td_estimation_converges():
    """cfg.estimate_td: the first-order velocity/residual LS (the
    capability behind parameters.cpp ESTIMATE_TD — the full VINS
    ProjectionTdFactor's td linearization) must drive est.td from 0
    toward a true 6 ms offset and improve APE over leaving td frozen."""
    true_td = 0.006
    est_on, ape_on = _run_online_td(True, true_td, n=200)
    est_off, _ = _run_online_td(False, true_td, n=200)
    assert est_off.td == 0.0
    # moving clearly toward the true offset (solver absorption makes full
    # convergence asymptotic; half-way in 200 frames is the measured
    # rate).  APE itself is not compared: the time base shifts while td
    # adapts, so the two trajectories' APEs are equal within noise.
    assert 2.0e-3 < est_on.td < 1.2 * true_td, est_on.td
    assert ape_on < 0.15, ape_on


def test_rolling_shutter_row_time_compensation():
    """cfg.rolling_shutter + rolling_shutter_tr (parameters.cpp
    ROLLING_SHUTTER/TR): features are shifted to the frame-start instant
    by vel * tr * row-fraction; a row-0 feature is untouched, a
    bottom-row feature moves by a full tr."""
    from vio_tpu.estimator import Estimator

    tr = 0.03
    cfg = sim_config(rolling_shutter=True, rolling_shutter_tr=tr)
    est = Estimator(cfg)
    vel = np.array([0.5, -0.2])
    xyz = np.array([0.1, 0.2, 1.0])
    h = float(cfg.image_height)
    est.process_image({1: (xyz.copy(), np.array([100.0, 0.0]), vel),
                       2: (xyz.copy(), np.array([100.0, h]), vel)}, 0.0)
    p_top = est.fm.features[1].pts[0]
    p_bot = est.fm.features[2].pts[0]
    np.testing.assert_allclose(p_top[:2], xyz[:2], atol=1e-12)
    np.testing.assert_allclose(p_bot[:2], xyz[:2] - vel * tr, atol=1e-12)
