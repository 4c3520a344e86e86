"""Loop closing integrated into a run: keyframe BoW database → geometric
verification (PnP on the old keyframe's local reconstruction) → pose-graph
drift correction that measurably cuts final APE.

Covers the chain the reference leaves unwired (reference:
estimator.cpp:622-642 relocalization math, euroc_config.yaml:66-70 unused
loop flags, 08-loop-closure DBoW demo).

Descriptors: each sim landmark carries a fixed random 256-bit descriptor
("oracle ORB" — what a distinctive real-world texture patch would give);
the rest of the pipeline (vocabulary training, TF-IDF BoW, relative-score
gating, mutual-Hamming matching, PnP verification, SE3 pose graph) runs
exactly as it would on real imagery.
"""
import numpy as np
import pytest

from vio_tpu import metrics, runner, sim
from vio_tpu.config import sim_config
from vio_tpu.estimator import MARGIN_OLD
from vio_tpu.loop.closer import LoopCloser

_RNG = np.random.default_rng(12345)
_DESC_CACHE: dict = {}


def oracle_desc(ids):
    out = np.zeros((len(ids), 8), np.uint32)
    for n, i in enumerate(ids):
        d = _DESC_CACHE.get(int(i))
        if d is None:
            d = _RNG.integers(0, 2 ** 32, size=8, dtype=np.uint32)
            _DESC_CACHE[int(i)] = d
        out[n] = d
    return out


@pytest.mark.slow
def test_loop_closing_cuts_drift():
    # ⅓-underestimated noise prior: the reference's worst sensitivity row
    # (APE 0.1583 m) — enough drift for a loop to visibly repair.
    data = sim.generate(noise=True, pixel_noise=0.0)
    cfg = sim_config(acc_n=0.2687 / 3.0, gyr_n=0.2121 / 3.0)

    closer = LoopCloser(R_ic=cfg.R_ic, t_ic=cfg.t_ic,
                        min_gap=80, train_after=25, loop_weight=5.0,
                        focal=cfg.focal_length)

    def on_frame(est, t, feats):
        if not est.initialized or est.marg_flag != MARGIN_OLD:
            return
        ids, xy, pts_cam = est.current_landmarks()
        if len(ids) < 10:
            return
        tt, p, R = est.latest_pose()
        closer.add_keyframe(tt, p, R, oracle_desc(ids), xy,
                            pts_cam=pts_cam, pts_xy=xy)

    est, traj = runner.run_sim(data, cfg, on_frame=on_frame)
    assert est.initialized
    gt_p, _ = runner.sim_ground_truth_at(data, traj["t"])
    ape_raw = metrics.ape_rmse(traj["p"], gt_p)

    assert len(closer.loops) >= 1, "no loop accepted over a closed circuit"
    Ps_c, Rs_c = closer.correct(traj["t"], traj["p"], traj["R"])
    ape_corr = metrics.ape_rmse(Ps_c, gt_p)

    # loop closing must measurably improve the trajectory
    assert ape_corr["rmse"] < 0.9 * ape_raw["rmse"], (ape_raw, ape_corr)
    # and the end-of-run error (where drift is worst) must shrink
    tail_raw = np.linalg.norm(traj["p"][-20:] - gt_p[-20:], axis=1).mean()
    tail_corr = np.linalg.norm(Ps_c[-20:] - gt_p[-20:], axis=1).mean()
    assert tail_corr < tail_raw, (tail_raw, tail_corr)
