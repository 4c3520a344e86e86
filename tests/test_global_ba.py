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
from vio_tpu.utils import lie

ROOT = Path(__file__).resolve().parent.parent


def make_problem(N=12, M=120, obs_per_lm=6, seed=0, dtype=jnp.float64):
    """Keyframes on an arc around a landmark cloud; every landmark observed
    in its host frame + obs_per_lm later frames."""
    rng = np.random.default_rng(seed)
    # trajectory: gentle arc with yaw
    Ps, Qs = [], []
    for k in range(N):
        ang = 1.4 * k / N          # ~1.4 rad total arc regardless of N
        Ps.append([4.0 * np.sin(ang), 4.0 - 4.0 * np.cos(ang), 0.3 * np.sin(0.5 * k)])
        Qs.append(np.asarray(lie.so3_exp_quat(jnp.asarray(
            [0.02 * np.sin(k), 0.02 * np.cos(k), ang]))))
    Ps = np.asarray(Ps)
    Qs = np.asarray(Qs)

    # cameras look along +z (identity-ish orientation, yaw about z):
    # the landmark cloud sits in front at z in [6, 14]
    pts = np.stack([rng.uniform(-3, 9, M), rng.uniform(-2, 6, M),
                    rng.uniform(6, 14, M)], axis=1)

    host = (np.arange(M) % (N - obs_per_lm)).astype(np.int32)
    inv_dep = np.empty(M)
    bearing0 = np.empty((M, 3))
    lm_idx, frame, bearing = [], [], []

    def project(k, X):
        R = np.asarray(lie.quat_to_mat(jnp.asarray(Qs[k])))
        Xc = R.T @ (X - Ps[k])
        return Xc

    # vectorized projection of every landmark into every frame
    Rs = np.stack([np.asarray(lie.quat_to_mat(jnp.asarray(q))) for q in Qs])
    Xc_all = np.einsum("kji,mj->kmi", Rs,
                       pts[None, :, :].repeat(1, 0)[0][None, :, :]
                       .repeat(N, 0).reshape(N, M, 3)[0]) * 0.0  # placeholder
    Xc_all = np.einsum("kji,kmj->kmi", Rs,
                       pts[None, :, :] - Ps[:, None, :])     # (N, M, 3)
    good = ((Xc_all[..., 2] > 1.0) &
            (np.abs(Xc_all[..., 0] / Xc_all[..., 2]) <= 2) &
            (np.abs(Xc_all[..., 1] / Xc_all[..., 2]) <= 2))   # (N, M)

    lm_valid = good[host, np.arange(M)]
    Xh = Xc_all[host, np.arange(M)]                           # (M, 3)
    inv_dep = np.where(lm_valid, 1.0 / np.maximum(Xh[:, 2], 1e-6), 1.0)
    bearing0 = np.where(lm_valid[:, None],
                        Xh / np.maximum(Xh[:, 2:3], 1e-6),
                        np.array([0.0, 0.0, 1.0]))

    offs = np.arange(1, obs_per_lm + 1)
    fr = host[None, :] + offs[:, None]                        # (K, M)
    ok = (fr < N) & lm_valid[None, :] & good[np.minimum(fr, N - 1),
                                             np.arange(M)[None, :]]
    ks, ms = np.nonzero(ok)
    frame = list(fr[ks, ms].astype(np.int32))
    lm_idx = list(ms.astype(np.int32))
    Xj = Xc_all[fr[ks, ms], ms]
    bearing = list(Xj / Xj[:, 2:3])

    O = len(lm_idx)
    # pad O to a multiple of 8 for the mesh test
    pad = (-O) % 8
    lm_idx += [0] * pad
    frame += [host[0]] * pad       # host == frame -> masked out
    bearing += [bearing[0]] * pad
    valid = np.asarray([True] * O + [False] * pad)

    p = global_ba.GlobalBA(
        Ps=jnp.asarray(Ps, dtype), Qs=jnp.asarray(Qs, dtype),
        inv_dep=jnp.asarray(inv_dep, dtype),
        host=jnp.asarray(host), bearing0=jnp.asarray(bearing0, dtype),
        lm_valid=jnp.asarray(lm_valid),
        lm_idx=jnp.asarray(lm_idx, jnp.int32),
        frame=jnp.asarray(frame, jnp.int32),
        bearing=jnp.asarray(np.asarray(bearing), dtype),
        valid=jnp.asarray(valid),
        sqrt_info=jnp.asarray(460.0 / 1.5, dtype))
    return p, pts


def perturb(p, seed=1, pose_sigma=0.03, rot_sigma=0.01, dep_sigma=0.05,
            fix_frames=2):
    rng = np.random.default_rng(seed)
    N = p.Ps.shape[0]
    mask = (np.arange(N) >= fix_frames)[:, None]
    dP = pose_sigma * rng.standard_normal((N, 3)) * mask
    dth = rot_sigma * rng.standard_normal((N, 3)) * mask
    Qs = lie.quat_normalize(jax.vmap(lie.quat_mul)(
        p.Qs, jax.vmap(lie.so3_exp_quat)(jnp.asarray(dth))))
    rel = 1.0 + dep_sigma * rng.standard_normal(p.inv_dep.shape[0])
    return p._replace(Ps=p.Ps + jnp.asarray(dP), Qs=Qs,
                      inv_dep=p.inv_dep * jnp.asarray(rel))


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
sys.path.insert(0, "tests")
from test_global_ba import make_problem, perturb
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
