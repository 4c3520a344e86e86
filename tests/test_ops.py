"""Pallas ops: the VMEM Gauss-Jordan SPD solve kernel (interpret mode on
CPU) must agree with jnp.linalg.solve (the non-TPU fallback path)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vio_tpu.ops import linsolve


def _spd(key, P, dtype):
    M = jax.random.normal(key, (P, P), dtype)
    return M @ M.T + P * jnp.eye(P, dtype=dtype)


@pytest.mark.parametrize("P", [17, 171, 300])
def test_gj_kernel_matches_linalg_solve(P):
    key = jax.random.PRNGKey(3 + P)
    A = _spd(key, P, jnp.float32)
    b = jax.random.normal(key, (P,), jnp.float32)
    x_ref = jnp.linalg.solve(A, b)

    N = max(linsolve._round_up(P, 128), 256)
    A_pad = jnp.zeros((N, N), A.dtype).at[:P, :P].set(A)
    b_pad = jnp.zeros((N, 128), A.dtype).at[:P, :].set(b[:, None])
    out = linsolve._gj_solve_pallas(A_pad, b_pad, P, interpret=True)
    x = out[:P, 0]
    np.testing.assert_allclose(np.asarray(x), np.asarray(x_ref),
                               rtol=2e-4, atol=2e-4)


def test_spd_solve_fallback_f64():
    key = jax.random.PRNGKey(5)
    A = _spd(key, 40, jnp.float64)
    b = jax.random.normal(key, (40,), jnp.float64)
    x = linsolve.spd_solve(A, b)
    np.testing.assert_allclose(np.asarray(A @ x), np.asarray(b), atol=1e-9)
