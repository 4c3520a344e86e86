"""Checkpoint / resume: serializing the full estimator state mid-sequence
and continuing must reproduce the uninterrupted run exactly (SURVEY §5.4 —
the reference has no checkpointing; this is a framework addition)."""
import numpy as np

from vio_tpu import checkpoint, runner, sim
from vio_tpu.config import sim_config


def test_resume_equivalence(tmp_path):
    data = sim.generate(noise=False)
    cfg = sim_config()

    # uninterrupted reference run
    est_ref, traj_ref = runner.run_sim(data, cfg, n_frames=80)

    # interrupted run: 50 frames → checkpoint → restore → continue to 80
    est_a, _ = runner.run_sim(data, cfg, n_frames=50)
    path = str(tmp_path / "ckpt.npz")
    checkpoint.save(est_a, path)
    est_b = checkpoint.load(path)

    # continue feeding frames 50..79 with the same measurement stream
    imu_i = int(np.searchsorted(data.imu_t, data.cam_t[49], side="right"))
    t_prev = data.cam_t[49]
    ts, ps = [], []
    for k in range(50, 80):
        t = data.cam_t[k]
        imu_i = runner.feed_interval(est_b, data.imu_t, data.acc, data.gyr,
                                     t_prev, t, imu_i)
        t_prev = t
        feats = {}
        for lid in np.where(data.obs_valid[k])[0]:
            xy = data.obs_xy[k, lid]
            feats[int(lid)] = (np.array([xy[0], xy[1], 1.0]),
                               data.obs_uv[k, lid], np.zeros(2))
        est_b.process_image(feats, t)
        if est_b.initialized:
            tt, p, _ = est_b.latest_pose()
            ts.append(tt)
            ps.append(p)

    # the resumed tail must match the uninterrupted run to solver precision
    n = len(ps)
    assert n >= 25
    np.testing.assert_allclose(np.asarray(ps),
                               traj_ref["p"][-n:], atol=1e-9)
    np.testing.assert_allclose(est_b.Ps, est_ref.Ps, atol=1e-9)
    np.testing.assert_allclose(est_b.H_prior, est_ref.H_prior, atol=1e-6)
