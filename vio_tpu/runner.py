"""Dataset playback drivers: feed simulator / EuRoC streams into the
estimator with the reference's IMU-image time pairing.

Re-derivation of the reference's System + entry points
(reference: vins-mono/src/System.cpp:289-443 getMeasurements /
ProcessBackEnd with boundary interpolation, test/run_vio_simulation.cpp —
the tracker-bypass path where exact landmark observations are packaged
directly, System.cpp:75-165).  No threads: playback is deterministic and
the estimator consumes measurements in order; the async host feed comes
with the frontend in a later stage.
"""
from __future__ import annotations

import numpy as np

from .config import VioConfig
from .estimator import Estimator


def feed_interval(est: Estimator, imu_t, acc, gyr, t_prev, t_img, i0):
    """Feed IMU samples in (t_prev, t_img] with boundary interpolation at
    t_img (the reference's send_imu/ProcessBackEnd pairing,
    System.cpp:372-396).  Returns the next unconsumed index."""
    i = i0
    current = t_prev
    n = len(imu_t)
    while i < n and imu_t[i] <= t_img:
        dt = imu_t[i] - current
        est.process_imu(dt, acc[i], gyr[i])
        current = imu_t[i]
        i += 1
    if i < n and current < t_img:
        # interpolate the straddling sample to land exactly on t_img
        w = (t_img - current) / (imu_t[i] - current)
        acc_b = (1 - w) * acc[i - 1] + w * acc[i]
        gyr_b = (1 - w) * gyr[i - 1] + w * gyr[i]
        est.process_imu(t_img - current, acc_b, gyr_b)
    return i


def run_sim(data, cfg: VioConfig | None = None, n_frames: int | None = None,
            progress=False, on_frame=None):
    """Run the estimator over a SimData dataset via the tracker-bypass
    path (landmark ids are feature ids; velocities zero like
    System.cpp:144-146).  Returns (est, traj dict)."""
    if cfg is None:
        from .config import sim_config
        cfg = sim_config()
    est = Estimator(cfg)

    n = len(data.cam_t) if n_frames is None else min(n_frames, len(data.cam_t))
    ts, ps, Rs_out, status = [], [], [], []
    imu_i = 0
    # est.td: camera-IMU time offset — t_imu = t_cam + td (reference:
    # parameters.cpp TD readParameters; estimator pairs IMU against
    # img_t + td).  Applied to every camera timestamp before pairing;
    # read LIVE from the estimator so online refinement (estimate_td)
    # shifts subsequent pairing.
    t_prev = data.cam_t[0] + getattr(est, "td", cfg.td)
    for k in range(n):
        t = data.cam_t[k] + getattr(est, "td", cfg.td)
        if k > 0:
            imu_i = feed_interval(est, data.imu_t, data.acc, data.gyr,
                                  t_prev, t, imu_i)
        t_prev = t
        feats = {}
        for lid in np.where(data.obs_valid[k])[0]:
            xy = data.obs_xy[k, lid]
            feats[int(lid)] = (np.array([xy[0], xy[1], 1.0]),
                               data.obs_uv[k, lid], np.zeros(2))
        est.process_image(feats, t)
        if est.initialized:
            tt, p, R = est.latest_pose()
            ts.append(tt)
            ps.append(p)
            Rs_out.append(R)
        status.append(est.initialized)
        if on_frame is not None:
            on_frame(est, t, feats)
        if progress and k % 50 == 0:
            print(f"frame {k}/{n} init={est.initialized} "
                  f"feats={len(est.fm.features)}")
    traj = dict(t=np.asarray(ts), p=np.asarray(ps), R=np.asarray(Rs_out),
                initialized=np.asarray(status))
    return est, traj


def sim_ground_truth_at(data, ts):
    """GT body positions/rotations at the given camera timestamps."""
    idx = np.searchsorted(data.cam_t, np.asarray(ts))
    return data.imu_p[idx], data.imu_R[idx]


# ---------------------------------------------------------------------------
# Image-stream playback: the run_euroc analog
# (reference: test/run_euroc.cpp:150-184 + System::PubImageData(cv::Mat)
#  System.cpp:167-266 — CLAHE→KLT tracking every frame, frequency-gated
#  publishing into the estimator, camera-stream discontinuity reset)
# ---------------------------------------------------------------------------

def camera_from_config(cfg: VioConfig):
    from .camera import PinholeCamera
    return PinholeCamera(fx=cfg.fx, fy=cfg.fy, cx=cfg.cx, cy=cfg.cy,
                         k1=cfg.k1, k2=cfg.k2, p1=cfg.p1, p2=cfg.p2,
                         width=cfg.image_width, height=cfg.image_height)


def make_tracker(cfg: VioConfig, camera=None, seed: int = 0):
    from .features.tracker import FeatureTracker
    if camera is None:
        camera = camera_from_config(cfg)
    return FeatureTracker(camera, max_cnt=cfg.max_cnt, min_dist=cfg.min_dist,
                          f_thresh_px=cfg.f_threshold,
                          focal=cfg.focal_length, equalize=cfg.equalize,
                          seed=seed)


def run_images(frames, imu_t, acc, gyr, cfg: VioConfig,
               camera=None, tracker=None, progress=False, on_frame=None):
    """Drive an image stream through the KLT tracker into the estimator.

    frames: iterable of (t_seconds, image) where image is an (H, W) array
    or a zero-arg callable returning one (lazy decode).  imu_t/acc/gyr:
    full-rate IMU arrays.  Mirrors the reference driver stack
    (run_euroc.cpp:150-184, System.cpp:167-266):

    - the first two frames prime the stream (init_feature / first_image_flag
      — the reference returns before tracking on both);
    - a >1 s gap or backwards timestamp resets the frequency control
      (System.cpp:93-100);
    - every surviving frame is CLAHE'd + tracked; features are published
      into the estimator only when the running publish rate is ≤ cfg.freq,
      and only features with track_cnt > 1 (System.cpp:228-266).

    Returns (est, traj dict) like run_sim.
    """
    est = Estimator(cfg)
    trk = tracker if tracker is not None else make_tracker(cfg, camera)

    imu_t = np.asarray(imu_t)
    acc = np.asarray(acc)
    gyr = np.asarray(gyr)

    init_feature = False
    first_image_flag = True
    first_image_time = 0.0
    last_image_time = 0.0
    pub_count = 1
    init_pub = False          # skip the first publish (System.cpp:252-257 —
                              # it carries no optical-flow velocities)
    imu_i = 0
    pub_t_prev = None

    ts, ps, Rs_out, status = [], [], [], []
    n_frames = 0
    for t, img in frames:
        t = t + getattr(est, "td", cfg.td)   # camera-IMU offset
        n_frames += 1
        if not init_feature:
            init_feature = True          # System.cpp:169-174
            continue
        if first_image_flag:
            first_image_flag = False     # System.cpp:176-182
            first_image_time = t
            last_image_time = t
            continue
        if t - last_image_time > 1.0 or t < last_image_time:
            # unstable camera stream → reset frequency control
            # (System.cpp:93-100 / :185-192)
            first_image_flag = True
            last_image_time = 0.0
            pub_count = 1
            continue
        last_image_time = t

        elapsed = max(t - first_image_time, 1e-9)
        pub_this_frame = round(pub_count / elapsed) <= cfg.freq
        if pub_this_frame and abs(pub_count / elapsed - cfg.freq) < 0.01 * cfg.freq:
            first_image_time = t
            pub_count = 0

        if callable(img):
            img = img()
        feats = trk.read_image(np.asarray(img), t)

        if pub_this_frame:
            pub_count += 1
            if not init_pub:
                init_pub = True
                continue
            if pub_t_prev is not None:
                imu_i = feed_interval(est, imu_t, acc, gyr, pub_t_prev, t, imu_i)
            else:
                imu_i = int(np.searchsorted(imu_t, t))
            pub_t_prev = t
            est.process_image(feats, t)
            if est.initialized:
                tt, p, R = est.latest_pose()
                ts.append(tt)
                ps.append(p)
                Rs_out.append(R)
            status.append(est.initialized)
            if on_frame is not None:
                on_frame(est, t, feats)
        if progress and n_frames % 50 == 0:
            print(f"frame {n_frames} t={t:.2f} tracked={len(feats)} "
                  f"init={est.initialized}")

    traj = dict(t=np.asarray(ts), p=np.asarray(ps), R=np.asarray(Rs_out),
                initialized=np.asarray(status))
    return est, traj


def run_images_async(frames, imu_t, acc, gyr, cfg: VioConfig,
                     camera=None, tracker=None, progress=False,
                     on_frame=None):
    """Pipeline-parallel image playback: the frontend (CLAHE + KLT
    tracking of frame t+1) runs in a producer thread, overlapped with the
    estimator's solve of frame t in the calling thread, connected by the
    C++ measurement pairer (native/vio_native.cpp — the reference's
    System queue/thread architecture, run_euroc.cpp:163-171 producer
    threads + System.cpp:339-443 ProcessBackEnd consumer, re-derived as a
    GIL-released pairing queue; SURVEY.md §2.5 pipeline analog).

    Same stream semantics as ``run_images`` (priming frames, >1 s-gap
    reset, cfg.freq publish gating, first-publish skip); the IMU feed is
    the pairer's boundary-interpolated rows instead of host-side
    ``feed_interval``.  Returns (est, traj dict).
    """
    import threading

    from . import runtime

    if runtime.load_native() is None:
        # the pure-Python pairer is single-threaded; without the C++
        # extension the synchronous driver is the correct degradation
        return run_images(frames, imu_t, acc, gyr, cfg, camera=camera,
                          tracker=tracker, progress=progress,
                          on_frame=on_frame)

    est = Estimator(cfg)
    trk = tracker if tracker is not None else make_tracker(cfg, camera)
    pairer = runtime.make_pairer()

    imu_t = np.asarray(imu_t)
    acc = np.asarray(acc)
    gyr = np.asarray(gyr)

    packets: dict[int, dict] = {}
    producer_error: list[BaseException] = []

    def producer():
        try:
            init_feature = False
            first_image_flag = True
            first_image_time = 0.0
            last_image_time = 0.0
            pub_count = 1
            init_pub = False
            imu_i = 0
            handle = 0
            n_frames = 0
            for t, img in frames:
                t = t + getattr(est, "td", cfg.td)   # camera-IMU offset, refined live
                n_frames += 1
                if not init_feature:
                    init_feature = True
                    continue
                if first_image_flag:
                    first_image_flag = False
                    first_image_time = t
                    last_image_time = t
                    continue
                if t - last_image_time > 1.0 or t < last_image_time:
                    first_image_flag = True
                    last_image_time = 0.0
                    pub_count = 1
                    continue
                last_image_time = t

                elapsed = max(t - first_image_time, 1e-9)
                pub = round(pub_count / elapsed) <= cfg.freq
                if pub and abs(pub_count / elapsed - cfg.freq) < 0.01 * cfg.freq:
                    first_image_time = t
                    pub_count = 0

                if callable(img):
                    img = img()
                feats = trk.read_image(np.asarray(img), t)

                if pub:
                    pub_count += 1
                    if not init_pub:
                        init_pub = True
                        continue
                    # stream IMU ahead of the frame so the pairer can close
                    # the packet (System.cpp: imu thread runs ahead)
                    while imu_i < len(imu_t) and imu_t[imu_i] <= t:
                        pairer.push_imu(float(imu_t[imu_i]), *acc[imu_i],
                                        *gyr[imu_i])
                        imu_i += 1
                    if imu_i < len(imu_t):
                        pairer.push_imu(float(imu_t[imu_i]), *acc[imu_i],
                                        *gyr[imu_i])
                        imu_i += 1
                    packets[handle] = feats
                    pairer.push_frame(float(t), handle)
                    handle += 1
                if progress and n_frames % 50 == 0:
                    print(f"[frontend] frame {n_frames} t={t:.2f} "
                          f"tracked={len(feats)}")
        except BaseException as e:  # surface in the consumer
            producer_error.append(e)
        finally:
            pairer.close()

    th = threading.Thread(target=producer, name="vio-frontend", daemon=True)
    th.start()

    ts, ps, Rs_out, status = [], [], [], []
    current = None
    n_solved = 0
    while True:
        pkt = pairer.next(wait=True)
        if pkt is None:
            break
        ft, handle, rows = pkt
        feats = packets.pop(handle)
        if current is None:
            current = ft          # first publish: no IMU integration yet
        else:
            for row in rows:
                rt = row[0]
                if rt <= current:
                    continue
                est.process_imu(rt - current, np.asarray(row[1:4]),
                                np.asarray(row[4:7]))
                current = rt
            if current < ft:
                current = ft
        est.process_image(feats, ft)
        n_solved += 1
        if est.initialized:
            tt, p, R = est.latest_pose()
            ts.append(tt)
            ps.append(p)
            Rs_out.append(R)
        status.append(est.initialized)
        if on_frame is not None:
            on_frame(est, ft, feats)
        if progress and n_solved % 50 == 0:
            print(f"[backend] solved {n_solved} t={ft:.2f} "
                  f"init={est.initialized}")
    th.join()
    if producer_error:
        raise producer_error[0]
    traj = dict(t=np.asarray(ts), p=np.asarray(ps), R=np.asarray(Rs_out),
                initialized=np.asarray(status))
    return est, traj


def sim_image_frames(data, n_frames: int | None = None, **render_kw):
    """Lazy (t, loader) frame stream rendered from a SimData sequence
    (sim.render_image) — the harness that exercises the REAL tracker path
    against exact geometry."""
    from . import sim as sim_mod
    n = len(data.cam_t) if n_frames is None else min(n_frames, len(data.cam_t))
    for k in range(n):
        yield float(data.cam_t[k]), (
            lambda kk=k: sim_mod.render_image(data, kk, **render_kw))


def run_euroc(seq_dir: str, cfg: VioConfig | None = None,
              n_frames: int | None = None, progress=False):
    """Play a EuRoC ASL sequence end-to-end (run_euroc.cpp analog).
    Returns (est, traj, data)."""
    from . import io as vio_io
    if cfg is None:
        from .config import euroc_config
        cfg = euroc_config()
    data = vio_io.load_euroc(seq_dir)

    def frames():
        n = len(data.cam_t) if n_frames is None else min(n_frames, len(data.cam_t))
        for k in range(n):
            yield float(data.cam_t[k]), (
                lambda kk=k: vio_io.load_image(data.cam_files[kk]))

    est, traj = run_images(frames(), data.imu_t, data.acc, data.gyr, cfg,
                           progress=progress)
    return est, traj, data
