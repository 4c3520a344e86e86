"""Headline benchmark: sliding-window BA solve throughput on one chip.

The reference's per-frame solver budget is 0.04 s (8-10 LM iterations over
~1k reprojection + 10 IMU factors; euroc_config.yaml max_solver_time /
estimator.cpp:1037) ⇒ 25 solved frames/s baseline.  The headline times the
SAME work shape — a full 10-iteration LM solve of a W=10 window with 256
reprojection factors (Hessian assembly + landmark Schur + damped pose
solve + state update, all on device) — and reports frames/s.

stdout carries ONE JSON line (the driver contract).  Additional breadth
metrics — the EuRoC shape (F=1024), batched KLT tracking, 100-keyframe
global BA — are printed to stderr and written to BENCH_DETAILS.json so
regressions across rounds stay visible.
"""
import json
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

BASELINE_FPS = 25.0  # reference solver budget: 0.04 s/frame


def _time_it(fn, *args, n=20, warmup=True):
    if warmup:
        jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


def bench_window(max_features: int, n: int = 20, want_flops: bool = False):
    from vio_tpu import testing
    from vio_tpu.solver import lm

    states, f, _ = testing.make_window_problem(
        window_size=10, max_features=max_features, imu_per_interval=16,
        dtype=jnp.float32)
    live = int(np.asarray(f.obs_mask).sum())

    def step(states, f):
        new_states, _, _, stats = lm.solve_window(states, f, max_iter=10)
        return new_states.Ps, stats["chi2"]

    jitted = jax.jit(step)
    dt = _time_it(jitted, states, f, n=n)
    flops = None
    if want_flops:
        try:
            ca = jitted.lower(states, f).compile().cost_analysis()
            if isinstance(ca, (list, tuple)):
                ca = ca[0]
            flops = float(ca.get("flops", 0.0)) or None
        except Exception:
            flops = None
    return 1.0 / dt, live, flops


def bench_e2e_sim(n_frames: int = 200):
    """Full estimator pipeline frames/s over the tracker-bypass sim stream
    (IMU feed + feature packaging + init + per-frame window solve +
    marginalization + slide — everything but image tracking)."""
    from vio_tpu import runner, sim

    data = sim.generate(noise=False)
    # warm the compile caches on a short prefix, then time a fresh run
    runner.run_sim(data, n_frames=min(40, n_frames))
    t0 = time.perf_counter()
    est, traj = runner.run_sim(data, n_frames=n_frames)
    wall = time.perf_counter() - t0
    return n_frames / wall, bool(est.initialized)


def bench_klt(n: int = 20):
    """Batched KLT frame-to-frame tracking: 150 features, 640², 3 levels —
    the reference's per-frame cv::calcOpticalFlowPyrLK work shape."""
    from vio_tpu.features import klt

    rng = np.random.default_rng(0)
    # smooth random texture so the patch systems are well-conditioned
    img0 = rng.standard_normal((640, 640)).astype(np.float32)
    for _ in range(2):
        img0 = (np.roll(img0, 1, 0) + np.roll(img0, -1, 0) +
                np.roll(img0, 1, 1) + np.roll(img0, -1, 1) + img0) / 5.0
    img0 = (img0 - img0.min()) / (img0.max() - img0.min()) * 255.0
    img1 = np.roll(img0, (2, 3), axis=(0, 1))
    p0 = rng.uniform(40, 600, (150, 2))
    a0 = jnp.asarray(img0)
    a1 = jnp.asarray(img1)
    pp = jnp.asarray(p0, jnp.float32)
    vv = jnp.ones(150, bool)

    def step(a0, a1, pp, vv):
        p1, ok, res = klt.track_fb(a0, a1, pp, vv)
        return p1

    dt = _time_it(step, a0, a1, pp, vv, n=n)
    return 1.0 / dt


def bench_global_ba(n: int = 5):
    """100-keyframe global BA (the scale-out configuration), full solve."""
    from vio_tpu import testing
    from vio_tpu.parallel import global_ba

    gt, _ = testing.make_global_problem(N=100, M=400, obs_per_lm=8,
                                        dtype=jnp.float32)
    noisy = testing.perturb_global(gt, pose_sigma=0.02, rot_sigma=0.005)

    def step(p):
        opt, stats = global_ba.solve(p, max_iter=10, fix_frames=2,
                                     loss_delta=50.0)
        return opt.Ps, stats["chi2"]

    dt = _time_it(jax.jit(step), noisy, n=n)
    return dt * 1e3


def main():
    details = {}

    fps, live, flops = bench_window(256, want_flops=True)
    details["window_ba_solve_fps_F256"] = round(fps, 2)
    details["window_ba_live_factors_F256"] = live
    if flops:
        # roofline note: XLA-counted FLOPs of one full 10-iter solve at the
        # padded grid shape; achieved rate = flops * solves/s.  The window
        # problem is small (P=87 reduced system), so this is latency- not
        # MXU-bound — the large-scale MXU numbers are the global-BA rows.
        details["window_ba_flops_per_solve"] = flops
        details["window_ba_achieved_gflops"] = round(flops * fps / 1e9, 1)

    fps1024, live1024, _ = bench_window(1024, n=10)
    details["window_ba_solve_fps_F1024_euroc_shape"] = round(fps1024, 2)
    details["window_ba_live_factors_F1024"] = live1024

    try:
        e2e_fps, init_ok = bench_e2e_sim()
        details["e2e_sim_fps_200frames"] = round(e2e_fps, 2)
        details["e2e_sim_initialized"] = init_ok
    except Exception as e:  # pragma: no cover
        details["e2e_sim_fps_200frames"] = f"error: {e}"

    try:
        details["klt_track_fps_150feat_640px_3lvl"] = round(bench_klt(), 2)
    except Exception as e:  # pragma: no cover
        details["klt_track_fps_150feat_640px_3lvl"] = f"error: {e}"

    try:
        details["global_ba_100kf_10iter_ms"] = round(bench_global_ba(), 2)
    except Exception as e:  # pragma: no cover
        details["global_ba_100kf_10iter_ms"] = f"error: {e}"

    details["device"] = str(jax.devices()[0])
    print(json.dumps(details, indent=2), file=sys.stderr)
    try:
        with open("BENCH_DETAILS.json", "w") as fh:
            json.dump(details, fh, indent=2)
    except OSError:
        pass

    print(json.dumps({
        "metric": "window_ba_solve_fps",
        "value": round(fps, 2),
        "unit": "frames/s (10-iter LM, W=10, F=256 grid / "
                f"{live} live factors, 1 chip)",
        "vs_baseline": round(fps / BASELINE_FPS, 2),
    }))


if __name__ == "__main__":
    main()
