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
