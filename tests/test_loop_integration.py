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


def test_loop_closer_save_load_roundtrip(tmp_path):
    """Pose-graph database persistence (the reference's
    pose_graph_save_path / load_previous_pose_graph flags,
    euroc_config.yaml:66-70 — read there, implemented here): keyframes,
    vocabulary, BoW database, and loop edges survive a save/load, and the
    reloaded closer produces the identical corrected trajectory."""
    rng = np.random.default_rng(7)
    closer = LoopCloser(min_gap=2, train_after=3, vocab_words=16,
                        min_matches=4)
    K = 8
    kf_P = rng.standard_normal((K, 3))
    for k in range(K):
        desc = rng.integers(0, 2 ** 32, size=(20, 8), dtype=np.uint32)
        xy = rng.standard_normal((20, 2)) * 0.3
        pts = rng.standard_normal((20, 3)) + np.array([0, 0, 5.0])
        closer.add_keyframe(0.1 * k, kf_P[k], np.eye(3), desc, xy,
                            pts_cam=pts, pts_xy=xy)
    # a hand-made accepted loop edge (identity relative pose)
    closer.loops.append((0, K - 1, np.zeros(3),
                         np.array([0.0, 0.0, 0.0, 1.0])))

    path = str(tmp_path / "posegraph.npz")
    closer.save(path)
    back = LoopCloser.load(path)

    assert len(back.kfs) == K
    assert back.vocab is not None and back.db is not None
    np.testing.assert_array_equal(np.asarray(back.vocab.words),
                                  np.asarray(closer.vocab.words))
    np.testing.assert_allclose(back.db.bows, closer.db.bows)
    assert len(back.loops) == 1
    for f0, f1 in zip(closer.kfs, back.kfs):
        np.testing.assert_array_equal(f0.desc, f1.desc)
        np.testing.assert_allclose(f0.p, f1.p)

    ts = 0.1 * np.arange(K)
    Rs = np.tile(np.eye(3), (K, 1, 1))
    P0, R0 = closer.correct(ts, kf_P, Rs, max_iter=10)
    P1, R1 = back.correct(ts, kf_P, Rs, max_iter=10)
    np.testing.assert_allclose(P1, P0, atol=1e-10)
    np.testing.assert_allclose(R1, R0, atol=1e-10)
