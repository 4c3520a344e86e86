"""Headline benchmark: sliding-window BA solve throughput on one chip.

The reference's per-frame solver budget is 0.04 s (8-10 LM iterations over
~1k reprojection + 10 IMU factors; euroc_config.yaml max_solver_time /
estimator.cpp:1037) ⇒ 25 solved frames/s baseline.  The headline times the
SAME work shape — a full 10-iteration LM solve of a W=10 window with 256
reprojection factors (Hessian assembly + landmark Schur + damped pose
solve + state update, all on device), with a pose perturbation injected so
the LM loop cannot early-stop.

TIMING METHODOLOGY (round 4).  This harness reaches its TPU through the
"axon" tunnel, whose per-call RPC overhead is ~26-50 ms — r1/r2 headline
numbers were inflated by a broken completion barrier (block_until_ready
returns at dispatch), and the r3 "honest host-sync" headline (18.7 fps)
was DEFLATED to the tunnel's round-trip rate: profiling shows the actual
on-device execution is ~7 ms while the host observes ~50 ms/call, and a
2-chained-solve program costs only one RTT more than 1 solve.  The
headline therefore reports ON-DEVICE execution time measured by the XLA
profiler (sum of device-lane jit_* executable durations / calls) — the
number that holds on production hardware where dispatch is local.  The
wall-clock per-call rate on this tunnel and the measured RTT are recorded
alongside in BENCH_DETAILS.json for full transparency.

Driver contract: stdout carries ONE JSON line, printed IMMEDIATELY after
the headline stage.  Breadth stages then run under a global time budget
(VIO_BENCH_BUDGET_S, default 185 s) and append to BENCH_DETAILS.json
after EVERY stage, so a hard kill still leaves partial evidence.  Set
VIO_BENCH_FULL=1 for the unbudgeted full run (600-frame fp32 on-chip APE
included).
"""
import glob
import gzip
import json
import os
import sys
import tempfile
import time

import numpy as np
import jax
import jax.numpy as jnp

# Persistent compile cache: solver programs cost minutes of (remote) XLA
# compile cold; cached they load in seconds, which is what lets the
# breadth stages fit the driver budget.
_cache = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
os.makedirs(_cache, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

BASELINE_FPS = 25.0  # reference solver budget: 0.04 s/frame
_T0 = time.monotonic()
_BUDGET = float(os.environ.get("VIO_BENCH_BUDGET_S", "185"))
_FULL = os.environ.get("VIO_BENCH_FULL", "") == "1"


def _remaining():
    return (_BUDGET - (time.monotonic() - _T0)) if not _FULL else 1e9


def _materialize(out):
    """Force results to host — the only reliable completion barrier on the
    axon tunnel (block_until_ready returns at dispatch there)."""
    for leaf in jax.tree.leaves(out):
        np.asarray(leaf)


def _parse_trace_device_ms(trace_dir):
    """Sum of device-lane top-level executable durations (ms) in the
    newest trace under trace_dir; None if no device events captured."""
    files = sorted(glob.glob(os.path.join(
        trace_dir, "plugins", "profile", "*", "*.trace.json.gz")))
    if not files:
        return None
    with gzip.open(files[-1]) as fh:
        tr = json.load(fh)
    ev = tr.get("traceEvents", [])
    dev_pids = {e["pid"] for e in ev
                if e.get("ph") == "M" and e.get("name") == "process_name"
                and "device:" in str(e.get("args", {}).get("name", ""))
                and "CPU" not in str(e.get("args", {}).get("name", ""))}
    total_us = 0.0
    n = 0
    for e in ev:
        if (e.get("ph") == "X" and e.get("pid") in dev_pids
                and str(e.get("name", "")).startswith("jit_")):
            total_us += e.get("dur", 0.0)
            n += 1
    if n == 0:
        return None
    return total_us / 1e3


def device_time_ms(fn, args, n=5):
    """On-device execution time per call (ms) via the XLA profiler, plus
    the UNTRACED wall per-call time (ms) — tracing itself slows the RPC
    path, so wall is timed in a separate plain loop.  Device time is None
    when the backend exposes no device lane (CPU)."""
    _materialize(fn(*args))                     # compile + warm
    t0 = time.perf_counter()
    for _ in range(n):
        _materialize(fn(*args))
    wall_ms = (time.perf_counter() - t0) / n * 1e3
    tmp = tempfile.mkdtemp(prefix="viobench_trace_")
    jax.profiler.start_trace(tmp)
    for _ in range(n):
        _materialize(fn(*args))
    jax.profiler.stop_trace()
    dev_total = _parse_trace_device_ms(tmp)
    return (dev_total / n if dev_total else None), wall_ms


def measure_rtt_ms(n=10):
    """Per-call host↔device round-trip of a trivial jitted add — the
    tunnel overhead floor every per-call wall number contains."""
    x = jnp.ones((8,), jnp.float32)
    f = jax.jit(lambda a: a + 1.0)
    _materialize(f(x))
    t0 = time.perf_counter()
    for _ in range(n):
        _materialize(f(x))
    return (time.perf_counter() - t0) / n * 1e3


def bench_window(max_features: int, n: int = 5, want_flops: bool = False,
                 compact: bool = True):
    from vio_tpu import testing
    from vio_tpu.solver import lm

    states, f, _ = testing.make_window_problem(
        window_size=10, max_features=max_features, imu_per_interval=16,
        dtype=jnp.float32)
    live = int(np.asarray(f.obs_mask).sum())
    # live-observation compaction (window.assemble n_obs): GEMM rows scale
    # with live factors, not the (F, W1) grid — the production estimator
    # path (estimator._obs_cap)
    n_obs = max(256, ((live + 255) // 256) * 256) if compact else None
    rng = np.random.default_rng(0)
    pert = jnp.asarray(rng.normal(0.0, 0.01, states.Ps.shape), jnp.float32)

    def step(states, pert):
        # perturb so the Nielsen loop runs all 10 iterations (a converged
        # fixed point would early-stop after 1 and flatter the number)
        s = states._replace(Ps=states.Ps + pert)
        new_states, _, _, stats = lm.solve_window(s, f, max_iter=10,
                                                  n_obs=n_obs)
        return new_states.Ps, stats["chi2"], stats["iterations"]

    jitted = jax.jit(step)
    dev_ms, wall_ms = device_time_ms(jitted, (states, pert), n=n)
    iters = int(np.asarray(jitted(states, pert)[2]))
    flops = None
    if want_flops:
        try:
            ca = jitted.lower(states, pert).compile().cost_analysis()
            if isinstance(ca, (list, tuple)):
                ca = ca[0]
            flops = float(ca.get("flops", 0.0)) or None
        except Exception:
            flops = None
    return dev_ms, wall_ms, live, iters, flops


def bench_klt(n: int = 5):
    """Batched KLT frame-to-frame fb-tracking: 150 features, 640², 3
    levels — the reference's per-frame cv::calcOpticalFlowPyrLK shape."""
    from vio_tpu.features import klt

    rng = np.random.default_rng(0)
    img0 = rng.standard_normal((640, 640)).astype(np.float32)
    for _ in range(2):
        img0 = (np.roll(img0, 1, 0) + np.roll(img0, -1, 0) +
                np.roll(img0, 1, 1) + np.roll(img0, -1, 1) + img0) / 5.0
    img0 = (img0 - img0.min()) / (img0.max() - img0.min()) * 255.0
    img1 = np.roll(img0, (2, 3), axis=(0, 1))
    a0 = jnp.asarray(img0)
    a1 = jnp.asarray(img1)
    pp = jnp.asarray(rng.uniform(40, 600, (150, 2)), jnp.float32)
    vv = jnp.ones(150, bool)

    step = jax.jit(lambda a0, a1, pp, vv: klt.track_fb(a0, a1, pp, vv)[0])
    return device_time_ms(step, (a0, a1, pp, vv), n=n)


def bench_global_ba(n: int = 3):
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

    return device_time_ms(jax.jit(step), (noisy,), n=n)


def bench_e2e_sim(n_frames: int = 120, trace_frames: int = 4):
    """Full estimator pipeline frames/s over the tracker-bypass sim stream
    (IMU feed + feature packaging + init + per-frame fused frame_step +
    host-f64 marg chain + slide — everything but image tracking).

    Two numbers, measured separately so each is self-consistent:
    - wall_fps over the full run (on this harness's axon tunnel this is
      RPC-bound — 1 dispatch + 1 fetch per frame at ~28 ms RTT each);
    - device_ms_per_frame from PER-FRAME profiler windows around
      ``trace_frames`` consecutive post-init frames (one long trace
      under-captured the device lane in round 4)."""
    from vio_tpu import runner, sim
    from vio_tpu.config import sim_config
    from vio_tpu.estimator import Estimator

    data = sim.generate(noise=False)
    # warm compiles: init completes ~frame 15 on this sim; 30 frames cover
    # the pre-init, init, and post-init frame_step programs
    runner.run_sim(data, n_frames=min(30, n_frames))
    t0 = time.perf_counter()
    est, traj = runner.run_sim(data, n_frames=n_frames)
    wall = time.perf_counter() - t0

    # --- per-frame device time on post-init frames ---
    cfg = sim_config()
    est2 = Estimator(cfg)
    imu_i = 0
    t_prev = data.cam_t[0] + est2.td
    per_frame_dev = []
    k = 0
    n_feed = min(40 + trace_frames + 5, len(data.cam_t))
    while k < n_feed and len(per_frame_dev) < trace_frames:
        t = data.cam_t[k] + est2.td
        if k > 0:
            imu_i = runner.feed_interval(est2, data.imu_t, data.acc,
                                         data.gyr, t_prev, t, imu_i)
        t_prev = t
        feats = {}
        for lid in np.where(data.obs_valid[k])[0]:
            xy = data.obs_xy[k, lid]
            feats[int(lid)] = (np.array([xy[0], xy[1], 1.0]),
                               data.obs_uv[k, lid], np.zeros(2))
        do_trace = est2.initialized
        if do_trace:
            tmp = tempfile.mkdtemp(prefix="viobench_e2ef_")
            jax.profiler.start_trace(tmp)
        est2.process_image(feats, t)
        if do_trace:
            jax.profiler.stop_trace()
            d = _parse_trace_device_ms(tmp)
            if d is not None:
                per_frame_dev.append(d)
        k += 1

    dev_ms = (round(float(np.mean(per_frame_dev)), 2)
              if per_frame_dev else None)
    return dict(wall_fps=round(n_frames / wall, 2),
                device_ms_per_frame=dev_ms,
                device_frames_traced=len(per_frame_dev),
                initialized=bool(est.initialized))


def bench_fp32_ape(n_frames: int = 600):
    """Full-length noise-free sim APE in on-device float32 — the accuracy
    evidence for the real chip (reference publishes 0.0409 m,
    doc/noise-free/results.zip::stats.json)."""
    from vio_tpu import metrics, runner, sim

    data = sim.generate(noise=False)
    est, traj = runner.run_sim(data, n_frames=n_frames)
    gt_p, _ = runner.sim_ground_truth_at(data, traj["t"])
    ape = metrics.ape_rmse(traj["p"], gt_p)
    return dict(ape_rmse_m=round(float(ape["rmse"]), 4),
                initialized=bool(est.initialized))


def _flush_details(details):
    """Merge-write: keys from previous runs (e.g. a VIO_BENCH_FULL run's
    fp32 600-frame APE) survive a later budgeted driver run that only
    re-measures a subset — round 4 lost the full-run rows to a plain
    overwrite here."""
    try:
        merged = {}
        try:
            with open("BENCH_DETAILS.json") as fh:
                merged = json.load(fh)
        except (OSError, ValueError):
            pass
        skipped = {k for k, v in details.items()
                   if isinstance(v, str) and v.startswith("skipped")}
        merged.update({k: v for k, v in details.items() if k not in skipped})
        # record the skip only when no prior numeric value exists
        for k in skipped:
            merged.setdefault(k, details[k])
        with open("BENCH_DETAILS.json", "w") as fh:
            json.dump(merged, fh, indent=2)
    except OSError:
        pass


def main():
    details = {"device": str(jax.devices()[0]),
               "budget_s": None if _FULL else _BUDGET,
               "methodology": (
                   "headline = on-device execution time from the XLA "
                   "profiler (device-lane jit_* durations); *_wall rows "
                   "include this harness's axon-tunnel RPC overhead "
                   "(tunnel_rtt_ms), absent on production hardware")}

    # ---- headline FIRST: the driver contract line, flushed immediately ----
    dev_ms, wall_ms, live, iters, flops = bench_window(256, want_flops=True)
    if dev_ms is not None:
        fps = 1e3 / dev_ms
        how = "on-device execution time (XLA profiler)"
    else:
        fps = 1e3 / wall_ms
        how = "wall per-call (no device lane in trace)"
    print(json.dumps({
        "metric": "window_ba_solve_fps",
        "value": round(fps, 2),
        "unit": "frames/s (full 10-iter LM, W=10, F=256 grid / "
                f"{live} live factors, 1 chip; {how}; perturbation-forced "
                f"{iters} LM iterations; wall per-call on this axon tunnel "
                f"= {wall_ms:.1f} ms incl. RPC, see BENCH_DETAILS)",
        "vs_baseline": round(fps / BASELINE_FPS, 2),
    }), flush=True)

    details["window_ba_device_ms_per_solve"] = \
        round(dev_ms, 3) if dev_ms else None
    details["window_ba_wall_ms_per_call"] = round(wall_ms, 2)
    details["window_ba_lm_iterations"] = iters
    details["window_ba_live_factors_F256"] = live
    if flops:
        details["window_ba_flops_per_solve"] = flops
        if dev_ms:
            details["window_ba_achieved_gflops"] = \
                round(flops / dev_ms / 1e6, 1)
    _flush_details(details)

    def stage(key, min_s, fn):
        if _remaining() < min_s:
            details[key] = f"skipped (budget: {_remaining():.0f}s left, " \
                           f"need ~{min_s}s)"
        else:
            t0 = time.monotonic()
            try:
                details[key] = fn()
            except Exception as e:  # pragma: no cover
                details[key] = f"error: {e}"
            details.setdefault("stage_wall_s", {})[key] = \
                round(time.monotonic() - t0, 1)
        _flush_details(details)

    stage("tunnel_rtt_ms", 10, lambda: round(measure_rtt_ms(), 2))

    def _klt():
        d, w = bench_klt()
        return dict(device_ms=round(d, 2) if d else None,
                    device_fps=round(1e3 / d, 1) if d else None,
                    wall_ms_per_call=round(w, 2))
    stage("klt_track_150feat_640px_3lvl", 30, _klt)

    def _w1024():
        d, w, live1k, it1k, _ = bench_window(1024, n=3)
        return dict(device_ms=round(d, 2) if d else None,
                    device_fps=round(1e3 / d, 1) if d else None,
                    wall_ms_per_call=round(w, 2), live_factors=live1k)
    stage("window_ba_F1024_euroc_shape", 35, _w1024)

    def _gba():
        d, w = bench_global_ba()
        return dict(device_ms_10iter=round(d, 2) if d else None,
                    wall_ms_per_call=round(w, 2))
    stage("global_ba_100kf", 35, _gba)

    # Adaptive depth: a slow-tunnel day shrinks the run instead of skipping
    # it, so numeric e2e evidence lands every driver round (a 60-frame run
    # still covers init + ~30 post-init solves).  Degraded runs write their
    # OWN key: tunnel wall variance is ±40% day to day and a short run's
    # wall_fps is init-amortization-poorer, so it must never overwrite the
    # canonical 120-frame row.
    n_e2e = 120 if _remaining() >= 65 else 60
    key_e2e = ("e2e_sim_120frames" if n_e2e == 120 else "e2e_sim_60frames")
    stage(key_e2e, 45,
          lambda: {**bench_e2e_sim(n_frames=n_e2e), "n_frames": n_e2e})
    if _FULL:
        stage("fp32_600frame_sim_ape_m", 600, bench_fp32_ape)

    details["total_wall_s"] = round(time.monotonic() - _T0, 1)
    _flush_details(details)
    print(json.dumps(details, indent=2), file=sys.stderr)


if __name__ == "__main__":
    main()
