"""Real-sensor evidence: the EuRoC MH-05 IMU stream the reference ships.

The reference's flagship entry point replays MH_05_imu0.txt /
MH_05_cam0.txt (reference: vins-mono/test/run_euroc.cpp:26-91 PubImuData /
PubImageData over the config/ index files).  Images are absent from this
environment, but the 22,721 real ADIS16448 samples (~113.6 s @ 200 Hz) and
the 2,273 camera timestamps exercise everything upstream of pixels:

  * Allan-variance noise identification on the real static prefix vs the
    EuRoC config priors (euroc_config.yaml acc_n 0.08 / gyr_n 0.004) and
    the ADIS16448 datasheet values the dataset documents
    (gyr ~1.7e-4 rad/s/sqrt(Hz), acc ~2.0e-3 m/s^2/sqrt(Hz));
  * measurement pairing replay over the real (slightly offset) streams —
    the first camera stamp precedes the first IMU sample by 20 ms, a
    boundary case synthetic streams never produce;
  * midpoint preintegration behavior on real gravity + real bias;
  * the init IMU-observability statistic (estimator.cpp:243-270) flipping
    from "not excited" on the static prefix to "excited" in flight.
"""
import os

import numpy as np
import pytest

from vio_tpu import io as vio_io
from vio_tpu import runtime
from vio_tpu.calib import allan
from vio_tpu.estimator import IntervalBuffer
from vio_tpu.init.alignment import excitation_std

REF_CFG = ("/root/reference/workspace/assignments/17-vins-initialization/"
           "vins-mono/config")
IMU_TXT = os.path.join(REF_CFG, "MH_05_imu0.txt")
CAM_TXT = os.path.join(REF_CFG, "MH_05_cam0.txt")

pytestmark = pytest.mark.skipif(
    not os.path.exists(IMU_TXT), reason="reference MH-05 IMU data absent")


@pytest.fixture(scope="module")
def mh05():
    t, acc, gyr = vio_io.load_imu_txt(IMU_TXT)
    cam_t, _ = vio_io.load_cam_stamps_txt(CAM_TXT)
    return t, acc, gyr, cam_t


def test_stream_sanity(mh05):
    t, acc, gyr, cam_t = mh05
    assert len(t) == 22721 and len(cam_t) == 2273
    dts = np.diff(t)
    assert np.all(dts > 0)                       # strictly monotonic
    assert abs(np.median(dts) - 0.005) < 1e-4    # 200 Hz
    assert abs(np.median(np.diff(cam_t)) - 0.05) < 1e-4  # 20 Hz
    # at rest the accelerometer reads |specific force| = g
    static = t - t[0] < 2.0
    assert abs(np.linalg.norm(acc[static], axis=1).mean() - 9.81) < 0.1


def test_static_prefix_detection(mh05):
    t, acc, gyr, _ = mh05
    n = allan.detect_static_prefix(gyr, dt=0.005)
    # MH-05 is at rest for ~3.5 s before the pre-flight wiggle
    assert 300 <= n <= 900
    assert np.linalg.norm(gyr[:n], axis=1).std() < 0.01


def test_allan_identifies_real_noise_densities(mh05):
    """Allan N on the real static prefix lands at the ADIS16448 datasheet
    level, 4-40x below the deliberately inflated euroc_config priors —
    the same over-bounding the reference's own noise-prior study calls
    'overestimated' (17-vins-initialization README)."""
    t, acc, gyr, _ = mh05
    n = allan.detect_static_prefix(gyr, dt=0.005)
    out_g = allan.calibrate(gyr[:n], dt=0.005, n_clusters=60)
    out_a = allan.calibrate(acc[:n], dt=0.005, n_clusters=60)
    for N in out_g["N"]:          # measured ~1.5-2.1e-4 rad/s/sqrt(Hz)
        assert 5e-5 < N < 8e-4
        assert N < 0.004 / 4      # config gyr_n prior is >4x above truth
    for N in out_a["N"]:          # measured ~1.4-2.2e-3 m/s^2/sqrt(Hz)
        assert 5e-4 < N < 8e-3
        assert N < 0.08 / 8       # config acc_n prior is >8x above truth


@pytest.mark.parametrize("impl", ["python", "native"])
def test_pairing_replay_full_sequence(mh05, impl):
    """Replay the full real streams through the measurement pairer: every
    frame with IMU coverage must yield a packet whose last row is
    boundary-interpolated exactly at the frame stamp
    (run_euroc.cpp playback + System.cpp getMeasurements semantics)."""
    t, acc, gyr, cam_t = mh05
    if impl == "native":
        native = runtime.load_native()
        if native is None:
            pytest.skip("native runtime not built")
        pairer = native.MeasurementPairer()
    else:
        pairer = runtime.PyMeasurementPairer()

    packets = []
    ci = 0
    for k in range(len(t)):
        pairer.push_imu(t[k], *acc[k], *gyr[k])
        while ci < len(cam_t) and cam_t[ci] <= t[k]:
            pairer.push_frame(cam_t[ci], ci)
            ci += 1
        while True:
            got = pairer.next()
            if got is None:
                break
            packets.append(got)

    stats = pairer.stats()
    assert stats["imu_disorder"] == 0 and stats["frame_disorder"] == 0
    # every frame except ones outside IMU coverage pairs up
    assert len(packets) >= len(cam_t) - 2
    prev_t = -np.inf
    short = 0
    for ft, handle, rows in packets[1:]:   # first frame predates the IMU
        assert ft > prev_t
        prev_t = ft
        if len(rows) < 9:
            short += 1
            continue
        # boundary interpolation lands the last sample exactly on the frame
        assert abs(rows[-1][0] - ft) < 1e-9
        rt = np.array([r[0] for r in rows])
        assert np.all(np.diff(rt) > 0)
    assert short <= 2              # real 200 Hz / 20 Hz stream: ~11 rows


def test_preintegration_static_real_gravity(mh05):
    """Midpoint preintegration over 2 s of real rest: velocity delta is
    g * dt (specific force), rotation stays at gyro-bias level."""
    t, acc, gyr, _ = mh05
    n = 400                                   # 2 s at 200 Hz
    buf = IntervalBuffer(acc[0], gyr[0])
    for k in range(1, n):
        buf.push(t[k] - t[k - 1], acc[k], gyr[k])
    dv, sdt = buf.delta_v()
    assert abs(sdt - (t[n - 1] - t[0])) < 1e-9
    speed = np.linalg.norm(dv) / sdt
    assert abs(speed - 9.81) < 0.15           # |dv|/dt == g up to bias
    # the real ADIS16448 wakes with a ~0.08 rad/s gyro bias (visible in
    # row 1 of the file); uncompensated it integrates to ~9 deg over 2 s
    R_raw = buf.delta_R(np.zeros(3))
    ang = lambda R: np.degrees(np.arccos(np.clip((np.trace(R) - 1) / 2,
                                                 -1, 1)))
    assert 4.0 < ang(R_raw) < 15.0
    # compensating with the static-mean bias (what solve_gyroscope_bias
    # recovers in init) collapses the rotation to noise level
    bg = gyr[:n].mean(axis=0)
    assert ang(buf.delta_R(bg)) < 0.2


def _interval_delta_vs(t, acc, gyr, cam_t, t_lo, t_hi):
    """Per camera-interval preintegrated (delta_v, sum_dt) inside
    [t_lo, t_hi] — the all_image_frame statistics the init check uses."""
    dvs, dts = [], []
    sel = cam_t[(cam_t >= t_lo) & (cam_t <= t_hi)]
    for a, b in zip(sel[:-1], sel[1:]):
        idx = np.where((t > a) & (t <= b))[0]
        if len(idx) < 2:
            continue
        buf = IntervalBuffer(acc[idx[0]], gyr[idx[0]])
        for k in idx[1:]:
            buf.push(t[k] - t[k - 1], acc[k], gyr[k])
        dv, sdt = buf.delta_v()
        if sdt > 0:
            dvs.append(dv)
            dts.append(sdt)
    return np.stack(dvs), np.asarray(dts)


def test_excitation_check_on_real_motion(mh05):
    """The estimator.cpp:243-270 observability statistic on real data:
    below the 0.25 m/s^2 reference threshold at rest, above it in
    flight — the gate the repo exposes as cfg.min_excitation."""
    t, acc, gyr, cam_t = mh05
    t0 = t[0]
    dvs, dts = _interval_delta_vs(t, acc, gyr, cam_t, t0 + 0.5, t0 + 2.5)
    ex_static = excitation_std(dvs, dts)
    assert ex_static < 0.25                   # would log "not enough"
    dvs, dts = _interval_delta_vs(t, acc, gyr, cam_t, t0 + 20.0, t0 + 22.0)
    ex_flight = excitation_std(dvs, dts)
    assert ex_flight > 0.25                   # real flight excites the init
    assert ex_flight > 5 * ex_static
