"""Online camera-IMU extrinsic rotation calibration, wired end-to-end.

The reference's ESTIMATE_EXTRINSIC==2 flow (reference:
vins-mono/src/estimator.cpp:161-184): per frame, feed hand-eye pairs
(two-view camera rotation, gyro-preintegrated body rotation) to the
calibrator until it accepts, install the solved R_ic, downgrade to
"optimize in BA" (mode 1), and only then allow initialization.
"""
import numpy as np
import pytest

from vio_tpu import metrics, runner, sim
from vio_tpu.config import sim_config

R_IC_GT = np.array([[0.0, 0.0, -1.0], [-1.0, 0.0, 0.0], [0.0, 1.0, 0.0]])


def _angle_deg(Ra, Rb):
    c = np.clip((np.trace(Ra.T @ Rb) - 1.0) / 2.0, -1.0, 1.0)
    return np.degrees(np.arccos(c))


@pytest.mark.slow
def test_online_extrinsic_calibration_converges():
    data = sim.generate(noise=False)
    # start with a WRONG extrinsic rotation (identity) and calibrate online
    cfg = sim_config(estimate_extrinsic=2,
                     ric=(1.0, 0.0, 0.0, 0.0, 1.0, 0.0, 0.0, 0.0, 1.0))
    # the sim rotates slowly (~0.7°/frame): the σ₃−σ₄ observability gap
    # needs ~8 s of pairs to open (see ExtrinsicRotationCalibrator.solve)
    est, traj = runner.run_sim(data, cfg, n_frames=300)

    # calibration accepted and downgraded to optimize-in-BA mode
    assert est.estimate_extrinsic == 1
    # solved rotation close to the simulator ground truth
    assert _angle_deg(est.ric, R_IC_GT) < 2.0, est.ric
    # the estimator still initializes and tracks accurately
    assert est.initialized
    assert est.failure_count == 0
    gt_p, _ = runner.sim_ground_truth_at(data, traj["t"])
    ape = metrics.ape_rmse(traj["p"], gt_p)
    assert ape["rmse"] < 0.1, ape
