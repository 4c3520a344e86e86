"""Large-window global BA: known-answer convergence on a synthetic
multi-keyframe scene, and sharded-vs-single-device agreement on the
virtual 8-device CPU mesh (the BASELINE.json scale-out north star — the
reference's window is fixed at 11 keyframes)."""
import os
import subprocess
import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vio_tpu.parallel import global_ba
from vio_tpu.testing import make_global_problem as make_problem
from vio_tpu.testing import perturb_global as perturb
from vio_tpu.utils import lie

ROOT = Path(__file__).resolve().parent.parent


def _constrained(p, min_obs=2):
    cnt = np.zeros(p.inv_dep.shape[0], int)
    for m, v in zip(np.asarray(p.lm_idx), np.asarray(p.valid)):
        cnt[m] += int(v)
    return np.asarray(p.lm_valid) & (cnt >= min_obs)


def test_global_ba_converges_to_ground_truth():
    gt, _ = make_problem()
    noisy = perturb(gt)
    opt, stats = global_ba.solve(noisy, max_iter=25, fix_frames=2)
    assert float(stats["chi2"]) < 1e-10 * float(stats["chi2_init"]), stats
    np.testing.assert_allclose(np.asarray(opt.Ps), np.asarray(gt.Ps),
                               atol=1e-6)
    sel = _constrained(gt)
    np.testing.assert_allclose(np.asarray(opt.inv_dep)[sel],
                               np.asarray(gt.inv_dep)[sel], rtol=1e-5)


def test_global_ba_larger_window():
    """100-keyframe window — ~10x the reference's entire state size."""
    gt, _ = make_problem(N=100, M=400, obs_per_lm=8)
    noisy = perturb(gt, pose_sigma=0.02, rot_sigma=0.005)
    # wider Cauchy delta for the noise-free global solve: the aggressive
    # 1 px^2 VINS default can strand a handful of landmarks in kernel
    # saturation when initial residuals span hundreds of px
    opt, stats = global_ba.solve(noisy, max_iter=25, fix_frames=2,
                                 loss_delta=50.0)
    assert float(stats["chi2"]) < 1e-8 * float(stats["chi2_init"]), stats
    err = np.linalg.norm(np.asarray(opt.Ps - gt.Ps), axis=1)
    assert err.max() < 1e-4, err.max()


SHARD_SCRIPT = r"""
import os
os.environ["XLA_FLAGS"] = os.environ.get("XLA_FLAGS", "") + \
    " --xla_force_host_platform_device_count=8"
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import numpy as np
import jax.numpy as jnp
import sys
from vio_tpu.testing import make_global_problem as make_problem
from vio_tpu.testing import perturb_global as perturb
from vio_tpu.parallel import global_ba, sharded

gt, _ = make_problem(N=12, M=120, obs_per_lm=6)
noisy = perturb(gt)
ref, ref_stats = global_ba.solve(noisy, max_iter=5, fix_frames=2)

mesh = sharded.make_mesh(8)
noisy_sh = global_ba.shard_problem(noisy, mesh)
opt, stats = global_ba.solve(noisy_sh, max_iter=5, fix_frames=2)
err = np.abs(np.asarray(opt.Ps) - np.asarray(ref.Ps)).max()
assert err < 1e-8, err
print("GLOBAL_BA_SHARD_OK", float(stats["chi2"]), err)
"""


def test_global_ba_sharded_matches():
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    r = subprocess.run([sys.executable, "-c", SHARD_SCRIPT], cwd=ROOT,
                       env=env, capture_output=True, text=True, timeout=900)
    assert r.returncode == 0, f"stdout:{r.stdout[-800:]}\nstderr:{r.stderr[-1500:]}"
    assert "GLOBAL_BA_SHARD_OK" in r.stdout


def test_global_ba_pcg_matches_direct():
    """Jacobi-PCG pose solve (the scalable path, reference PCGSolver
    problem.cc:580-610) agrees with the direct solve to solver precision."""
    gt, _ = make_problem(N=8, M=64, obs_per_lm=4)
    noisy = perturb(gt, pose_sigma=0.02, rot_sigma=0.005)
    ref, _ = global_ba.solve(noisy, max_iter=8, fix_frames=2)
    out, _ = global_ba.solve(noisy, max_iter=8, fix_frames=2, use_pcg=True)
    err = np.abs(np.asarray(out.Ps) - np.asarray(ref.Ps)).max()
    assert err < 1e-8, err


MAP_SHARD_SCRIPT = r"""
import os
os.environ["XLA_FLAGS"] = os.environ.get("XLA_FLAGS", "") + \
    " --xla_force_host_platform_device_count=8"
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np
from vio_tpu import testing
from vio_tpu.parallel import global_ba

gt, _ = testing.make_global_problem(N=16, M=64, obs_per_lm=4,
                                    dtype=jnp.float32)
noisy = testing.perturb_global(gt, pose_sigma=0.02, rot_sigma=0.005)
ref, s1 = global_ba.solve(noisy, max_iter=6, fix_frames=2)
mesh = global_ba.make_mesh_2d(2, 4)
p_sh = global_ba.prepare_sharded(noisy, mesh)
out, s2 = global_ba.solve_sharded(p_sh, mesh, max_iter=6, fix_frames=2)
err = np.abs(np.asarray(out.Ps) - np.asarray(ref.Ps)).max()
assert err < 1e-4, err
print("MAPSHARD_OK", err, float(s1["chi2"]), float(s2["chi2"]))
"""


def test_global_ba_map_axis_sharded():
    """2-D ("map", "factor") mesh: observations sharded everywhere, the
    reduced camera system row-partitioned over "map", pose solve via
    sharded Jacobi-PCG — exact-trajectory agreement with single device."""
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    r = subprocess.run([sys.executable, "-c", MAP_SHARD_SCRIPT], cwd=ROOT,
                       env=env, capture_output=True, text=True, timeout=900)
    assert r.returncode == 0, f"stdout:{r.stdout[-800:]}\nstderr:{r.stderr[-1500:]}"
    assert "MAPSHARD_OK" in r.stdout
