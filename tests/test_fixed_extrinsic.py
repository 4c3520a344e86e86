"""Fixed-extrinsic (estimate_extrinsic=0) long-run consistency.

The solve masks extrinsic rows when the extrinsic is fixed
(solver/window.py fix_ext → ext columns zeroed; prior rows zeroed at
window.py:298-303) while marginalization keeps accumulating extrinsic
information (marginalize.py assembles with fix_ext=False, matching the
reference's Marginalize which never zeroes fixed vertices).  Round-2
verdict (weak #8) flagged the asymmetry: this pins down that a fixed-
extrinsic run (a) never writes the extrinsic back and (b) stays accurate
over enough slides for the prior to have folded many times.
(reference: estimator.cpp:914-953 para_Ex_Pose held constant when
ESTIMATE_EXTRINSIC == 0, problem.cc marginalization without masking.)
"""
import numpy as np

from vio_tpu import metrics, runner, sim
from vio_tpu.config import sim_config


def test_fixed_extrinsic_run_stays_consistent():
    data = sim.generate(noise=False)
    cfg = sim_config()                      # estimate_extrinsic defaults 0
    assert cfg.estimate_extrinsic == 0
    est, traj = runner.run_sim(data, cfg=cfg, n_frames=80)
    assert est.initialized

    # (a) the configured extrinsic is bitwise untouched by 70 solves
    np.testing.assert_array_equal(est.ric, cfg.R_ic)
    np.testing.assert_array_equal(est.tic, cfg.t_ic)

    # (b) accuracy holds through many marginalization folds
    gt_p, _ = runner.sim_ground_truth_at(data, traj["t"])
    ape = metrics.ape_rmse(traj["p"], gt_p)
    assert ape["rmse"] < 0.01, ape
