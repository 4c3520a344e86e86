"""Headline benchmark: sliding-window BA solve throughput on one chip.

The reference's per-frame solver budget is 0.04 s (8-10 LM iterations over
~1k reprojection + 10 IMU factors; euroc_config.yaml max_solver_time /
estimator.cpp:1037) ⇒ 25 solved frames/s baseline.  This benchmark times
the SAME work shape — a full 10-iteration LM solve of a W=10 window with
256 reprojection factors (Hessian assembly + landmark Schur + damped pose
solve + state update, all on device) — and reports frames/s.

Prints one JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
import json
import time

import jax
import jax.numpy as jnp

BASELINE_FPS = 25.0  # reference solver budget: 0.04 s/frame


def main():
    from vio_tpu import testing
    from vio_tpu.solver import lm

    dtype = jnp.float32
    states, f, _ = testing.make_window_problem(
        window_size=10, max_features=256, imu_per_interval=16, dtype=dtype)

    def step(states, f):
        new_states, _, _, stats = lm.solve_window(states, f, max_iter=10)
        return new_states.Ps, stats["chi2"]

    step_j = jax.jit(step)
    # warmup / compile
    out = step_j(states, f)
    jax.block_until_ready(out)

    n = 20
    t0 = time.perf_counter()
    for _ in range(n):
        out = step_j(states, f)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n

    fps = 1.0 / dt
    print(json.dumps({
        "metric": "window_ba_solve_fps",
        "value": round(fps, 2),
        "unit": "frames/s (10-iter LM, W=10, F=256, 1 chip)",
        "vs_baseline": round(fps / BASELINE_FPS, 2),
    }))


if __name__ == "__main__":
    main()
