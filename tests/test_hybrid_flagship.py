"""Hybrid real-sensor flagship: the REAL MH-05 IMU stream + REAL camera
stamps through the full 640² distorted-CLAHE pixel pipeline.

This is the closest run_euroc analog this environment permits
(reference flagship: vins-mono/test/run_euroc.cpp:150-184 on MH-05;
the image files are absent, but the full real sensor streams ship in
vins-mono/config/MH_05_imu0.txt / MH_05_cam0.txt).  Pixels are rendered
from the IMU-consistent dead-reckoned trajectory (vio_tpu/hybrid.py), so
every IMU sample, every timestamp, the static-prefix bias wake-up, and
the MAV's true dynamics are REAL — the estimator must ride out the
static start, initialize when the real motion provides excitation, and
track the real flight profile.
"""
import os

import numpy as np
import pytest

from vio_tpu import hybrid, metrics, runner
from vio_tpu.config import sim_images_config

REF_CFG = ("/root/reference/workspace/assignments/17-vins-initialization/"
           "vins-mono/config")
IMU_TXT = os.path.join(REF_CFG, "MH_05_imu0.txt")
CAM_TXT = os.path.join(REF_CFG, "MH_05_cam0.txt")

pytestmark = pytest.mark.skipif(
    not (os.path.exists(IMU_TXT) and os.path.exists(CAM_TXT)),
    reason="reference MH-05 sensor streams not available")

# EuRoC-magnitude radial-tangential distortion (config/euroc_config.yaml)
DISTORT = dict(k1=-0.28, k2=0.07, p1=1.0e-4, p2=-2.0e-4)


def test_hybrid_dataset_is_imu_consistent():
    """The rendered GT must be consistent with the real IMU: midpoint
    re-integration of the shipped samples with the dataset's bias
    reproduces the GT trajectory (by construction — this guards the
    generator wiring, interpolation, and bias bookkeeping)."""
    d = hybrid.generate_hybrid(IMU_TXT, CAM_TXT, duration=12.0)
    bg, ba, R0 = hybrid.static_init(d.imu_t, d.acc, d.gyr)
    np.testing.assert_allclose(bg, d.gyr_bias[0])
    np.testing.assert_allclose(ba, d.acc_bias[0])
    Rs, ps, vs = hybrid.dead_reckon(d.imu_t, d.acc, d.gyr, bg, ba, R0)
    idx = np.searchsorted(d.imu_t, d.cam_t, side="right") - 1
    err = np.linalg.norm(ps[idx] - d.imu_p, axis=1)
    assert err.max() < 0.05, err.max()     # sub-5cm interp mismatch
    # real streams: 200 Hz IMU, 20 Hz camera, strictly monotonic
    assert abs(np.median(np.diff(d.imu_t)) - 0.005) < 1e-4
    assert abs(np.median(np.diff(d.cam_t)) - 0.05) < 1e-4
    assert d.obs_valid.sum(1).min() >= 40


@pytest.mark.slow
def test_hybrid_real_imu_pixels_end_to_end():
    """Full pixel pipeline on the hybrid stream: CLAHE + KLT on rendered
    640² distorted frames at the REAL camera stamps, REAL IMU samples
    paired by timestamp, real static start → excitation-gated init →
    window tracking of the real flight.  APE gated against the rendered
    GT (reference publishes 0.0409 m on the true MH-05 pixels)."""
    from vio_tpu import sim

    d = hybrid.generate_hybrid(IMU_TXT, CAM_TXT, duration=30.0, **DISTORT)
    cfg = sim_images_config(equalize=True, freq=10,
                            outlier_reproj_px=3.0, **DISTORT)

    def frames():
        for k in range(len(d.cam_t)):
            yield float(d.cam_t[k]), (
                lambda kk=k: sim.render_image(d, kk))

    est, traj = runner.run_images(frames(), d.imu_t, d.acc, d.gyr, cfg)
    assert est.initialized
    gt_p, _ = runner.sim_ground_truth_at(d, traj["t"])
    ape = metrics.ape_rmse(traj["p"], gt_p)
    # real-dynamics pixel run: hold to sub-0.5% of the ~50 m flight path
    assert ape["rmse"] < 0.25, ape
    # the solved gyro bias must land at the real static-prefix bias
    assert np.linalg.norm(est.Bgs[-1] - d.gyr_bias[0]) < 0.01
