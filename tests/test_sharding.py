"""Multi-device sharded-solver tests, run in a subprocess with a virtual
8-device CPU mesh (SURVEY.md §4 multi-node strategy: exercise the
psum/all-gather graph without a pod).  Subprocess isolation because
--xla_force_host_platform_device_count must be set before backend init
and has destabilized full-suite processes on this 2-core machine."""
import os
import subprocess
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent

SCRIPT = r"""
import os
os.environ["XLA_FLAGS"] = os.environ.get("XLA_FLAGS", "") + \
    " --xla_force_host_platform_device_count=8"
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np
import jax.numpy as jnp

import __graft_entry__ as g

# single-chip compile check
fn, args = g.entry()
out = jax.jit(fn)(*args)
chi = float(out[1])
assert np.isfinite(chi), chi

# full sharded training step on the 8-device mesh
g.dryrun_multichip(8)

# sharded vs single-device numerical agreement
from vio_tpu import testing
from vio_tpu.parallel import sharded
from vio_tpu.solver import lm
states, f, _ = testing.make_window_problem(window_size=4, max_features=32,
                                           imu_per_interval=4,
                                           dtype=jnp.float32)
ref_states, _, _, ref_stats = lm.solve_window(states, f, max_iter=2)
mesh = sharded.make_mesh(8)
s_sh, f_sh = sharded.shard_problem(states, f, mesh)
new_states, chi2 = sharded.training_step(s_sh, f_sh, max_iter=2)
err = np.abs(np.asarray(new_states.Ps) - np.asarray(ref_states.Ps)).max()
assert err < 1e-3, f"sharded/unsharded mismatch: {err}"
print("SHARDING_OK", chi, float(chi2), err)
"""


def test_sharded_solver_8_devices():
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    r = subprocess.run([sys.executable, "-c", SCRIPT], cwd=ROOT, env=env,
                       capture_output=True, text=True, timeout=900)
    assert r.returncode == 0, f"stdout:{r.stdout[-800:]}\nstderr:{r.stderr[-1500:]}"
    assert "SHARDING_OK" in r.stdout
