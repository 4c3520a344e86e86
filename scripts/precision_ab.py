"""On-chip A/B of the TPU matmul precision default.

The MXU offers three f32-matmul modes: DEFAULT (operands truncated to
bf16, 1 pass), HIGH (3-pass bf16, error ~2^-22 — true-f32 equivalent),
and HIGHEST (6-pass, beyond f32).  Round-3 forced HIGHEST globally after
DEFAULT broke visual-inertial initialization (|g| solved 2-6 m/s^2
instead of 9.8); that fixed accuracy but cost 8x on the window-solve
headline (151.5 -> 18.3 fps).  For a float32 pipeline HIGH should be
numerically indistinguishable from HIGHEST at half the pass count.

Usage: python scripts/precision_ab.py [high|highest|default] [n_frames]
Prints one JSON line: headline window-solve fps + short e2e sim APE.
"""
import json
import os
import sys
import time

mode = sys.argv[1] if len(sys.argv) > 1 else "high"
n_frames = int(sys.argv[2]) if len(sys.argv) > 2 else 200

# must win the race with vio_tpu.__init__'s TPU default (highest): set the
# global BEFORE importing the package, then override after import too.
import jax

jax.config.update("jax_default_matmul_precision", mode)
_cache = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                      ".jax_cache")
os.makedirs(_cache, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import numpy as np  # noqa: E402

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import vio_tpu  # noqa: E402,F401  (may re-pin precision on TPU)

jax.config.update("jax_default_matmul_precision", mode)

from vio_tpu import metrics, runner, sim, testing  # noqa: E402
from vio_tpu.solver import lm  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def materialize(out):
    for leaf in jax.tree.leaves(out):
        np.asarray(leaf)


# --- headline: 10-iter window solve fps, PROFILER device time (the
# bench.py methodology — wall per-call on the axon tunnel is RPC-bound
# and insensitive to precision, which is why the r3 "8x precision cost"
# and the r4 "precision irrelevant" wall readings disagreed) -----------
import bench  # noqa: E402  (repo root; sets the compile cache)

dev_ms, wall_ms, live, iters, _ = bench.bench_window(256, n=5)
fps = 1e3 / dev_ms if dev_ms else 1e3 / wall_ms
dev1024, wall1024, live1024, _, _ = bench.bench_window(1024, n=3)

# --- short e2e: init must solve gravity; APE must stay at f64 level ----
data = sim.generate(noise=False)
t0 = time.perf_counter()
est, traj = runner.run_sim(data, n_frames=n_frames)
e2e_wall = time.perf_counter() - t0
gt_p, _ = runner.sim_ground_truth_at(data, traj["t"])
ape = metrics.ape_rmse(traj["p"], gt_p)

print(json.dumps({
    "precision": mode,
    "window_fps_device": round(fps, 2),
    "window_wall_ms": round(wall_ms, 1),
    "window_F1024_device_ms": round(dev1024, 2) if dev1024 else None,
    "e2e_frames": n_frames,
    "e2e_wall_s": round(e2e_wall, 1),
    "initialized": bool(est.initialized),
    "failures": int(est.failure_count),
    "ape_rmse_m": round(float(ape["rmse"]), 5),
}), flush=True)
