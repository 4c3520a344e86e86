"""Known-answer tests for the Lie/quaternion substrate.

Covers the reference's assignment-11 rotation-update equivalence check
(11-vio-intro/rotation_update.cpp:36-49) and Utility helpers."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vio_tpu.utils import lie


def rand_quat(rng):
    q = rng.standard_normal(4)
    return jnp.asarray(q / np.linalg.norm(q))


def test_quat_mat_roundtrip():
    rng = np.random.default_rng(0)
    for _ in range(20):
        q = rand_quat(rng)
        R = lie.quat_to_mat(q)
        q2 = lie.mat_to_quat(R)
        # q and -q are the same rotation
        assert min(np.linalg.norm(q - q2), np.linalg.norm(q + q2)) < 1e-12


def test_quat_rotate_matches_matrix():
    rng = np.random.default_rng(1)
    q = rand_quat(rng)
    v = jnp.asarray(rng.standard_normal(3))
    assert np.allclose(lie.quat_rotate(q, v), lie.quat_to_mat(q) @ v, atol=1e-12)


def test_rotation_update_equivalence():
    """Quaternion small-angle update vs SO3 exp update agree to O(|w|^2)
    (reference assignment 11)."""
    rng = np.random.default_rng(2)
    q = rand_quat(rng)
    w = jnp.asarray([0.01, 0.02, 0.03])
    q_upd = lie.quat_normalize(lie.quat_mul(q, lie.delta_q(w)))
    R_upd = lie.quat_to_mat(q) @ lie.so3_exp_mat(w)
    assert np.allclose(lie.quat_to_mat(q_upd), R_upd, atol=1e-4)


def test_exp_log_roundtrip():
    rng = np.random.default_rng(3)
    for _ in range(20):
        phi = rng.standard_normal(3)
        phi = phi / np.linalg.norm(phi) * rng.uniform(1e-8, 3.0)
        phi = jnp.asarray(phi)
        q = lie.so3_exp_quat(phi)
        assert np.allclose(lie.quat_log(q), phi, atol=1e-9)
        R = lie.so3_exp_mat(phi)
        assert np.allclose(lie.so3_log_mat(R), phi, atol=1e-8)


def test_ypr_roundtrip():
    ypr = jnp.asarray([30.0, 20.0, -40.0])
    R = lie.ypr_to_mat(ypr)
    assert np.allclose(lie.mat_to_ypr(R), ypr, atol=1e-10)


def test_g2R_aligns_gravity_and_zero_yaw():
    g = jnp.asarray([0.11, -0.2, 9.79])
    R0 = lie.g_to_R(g)
    aligned = R0 @ (g / jnp.linalg.norm(g))
    assert np.allclose(aligned, [0, 0, 1], atol=1e-12)
    assert abs(float(lie.mat_to_ypr(R0)[0])) < 1e-9


def test_jacobian_r_inv_small_angle():
    phi = jnp.asarray([1e-9, -1e-9, 1e-9])
    J = lie.so3_jacobian_r_inv(phi)
    assert np.allclose(J, np.eye(3), atol=1e-8)


def test_q_corners():
    rng = np.random.default_rng(4)
    q = rand_quat(rng)
    L = lie.q_left_corner(q)
    Rc = lie.q_right_corner(q)
    expect_L = float(q[3]) * np.eye(3) + np.asarray(lie.so3_hat(q[:3]))
    expect_R = float(q[3]) * np.eye(3) - np.asarray(lie.so3_hat(q[:3]))
    assert np.allclose(L, expect_L)
    assert np.allclose(Rc, expect_R)


def test_vmap_batching():
    rng = np.random.default_rng(5)
    qs = jnp.asarray(rng.standard_normal((7, 4)))
    qs = qs / jnp.linalg.norm(qs, axis=-1, keepdims=True)
    Rs = lie.quat_to_mat(qs)
    assert Rs.shape == (7, 3, 3)
    qs2 = lie.mat_to_quat(Rs)
    for i in range(7):
        d = min(np.linalg.norm(qs[i] - qs2[i]), np.linalg.norm(qs[i] + qs2[i]))
        assert d < 1e-10
