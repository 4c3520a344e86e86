"""Analytic-vs-autodiff Jacobian asserts for every factor type.

The reference keeps these checks commented out
(edge_reprojection.cc:110-126, integration_base.h:279-445); here they are
mandatory tests.  Each factor's analytic Jacobian must match jacfwd of the
residual through the local parameterization (right-multiplicative SO3
update, vertex_pose.cc:7-19)."""
import jax
import jax.numpy as jnp
import numpy as np

from vio_tpu import factors, imu
from vio_tpu.utils import lie

NOISE_D = imu.noise_diag(0.2687, 0.2121, 7.07e-6, 7.07e-7)


def rand_quat(rng):
    q = rng.standard_normal(4)
    return jnp.asarray(q / np.linalg.norm(q))


def pose_plus(P, Q, delta):
    """Local parameterization: the reference's VertexPose::Plus."""
    return P + delta[:3], lie.quat_normalize(
        lie.quat_mul(Q, lie.so3_exp_quat(delta[3:6])))


def make_imu_terms(rng, n=15):
    dts = jnp.full((n,), 0.005)
    accs = jnp.asarray(rng.standard_normal((n, 3)) + np.array([0, 0, 9.8]))
    gyrs = jnp.asarray(rng.standard_normal((n, 3)) * 0.2)
    st = imu.preintegrate(dts, accs, gyrs, jnp.ones((n,), bool),
                          accs[0], gyrs[0], jnp.zeros(3), jnp.zeros(3), NOISE_D)
    return factors.ImuFactorTerms.from_state(st)


def test_imu_factor_jacobians():
    rng = np.random.default_rng(0)
    terms = make_imu_terms(rng)
    g = jnp.asarray([0.0, 0.0, 9.81])
    Pi = jnp.asarray(rng.standard_normal(3))
    Qi = rand_quat(rng)
    Vi = jnp.asarray(rng.standard_normal(3))
    Bai = jnp.asarray(rng.standard_normal(3) * 0.05)
    Bgi = jnp.asarray(rng.standard_normal(3) * 0.02)
    Pj = Pi + jnp.asarray(rng.standard_normal(3) * 0.1)
    Qj = lie.quat_normalize(lie.quat_mul(Qi, lie.so3_exp_quat(
        jnp.asarray(rng.standard_normal(3) * 0.1))))
    Vj = Vi + jnp.asarray(rng.standard_normal(3) * 0.1)
    Baj = Bai + jnp.asarray(rng.standard_normal(3) * 0.01)
    Bgj = Bgi + jnp.asarray(rng.standard_normal(3) * 0.01)

    Jpi, Jsbi, Jpj, Jsbj = factors.imu_jacobians(
        terms, g, Pi, Qi, Vi, Bai, Bgi, Pj, Qj, Vj, Baj, Bgj)

    def res_pose_i(d):
        P, Q = pose_plus(Pi, Qi, d)
        return factors.imu_residual(terms, g, P, Q, Vi, Bai, Bgi,
                                    Pj, Qj, Vj, Baj, Bgj)

    def res_sb_i(d):
        return factors.imu_residual(terms, g, Pi, Qi, Vi + d[:3], Bai + d[3:6],
                                    Bgi + d[6:9], Pj, Qj, Vj, Baj, Bgj)

    def res_pose_j(d):
        P, Q = pose_plus(Pj, Qj, d)
        return factors.imu_residual(terms, g, Pi, Qi, Vi, Bai, Bgi,
                                    P, Q, Vj, Baj, Bgj)

    def res_sb_j(d):
        return factors.imu_residual(terms, g, Pi, Qi, Vi, Bai, Bgi,
                                    Pj, Qj, Vj + d[:3], Baj + d[3:6], Bgj + d[6:9])

    z6, z9 = jnp.zeros(6), jnp.zeros(9)
    # The rotation rows use the bias-corrected-q left/right-corner forms; the
    # residual's nonlinearity makes these first-order accurate — match ~1e-6
    # at the linearization point except dtheta coupling terms (~1e-3 scale).
    assert np.allclose(jax.jacfwd(res_pose_i)(z6), Jpi, atol=2e-3)
    assert np.allclose(jax.jacfwd(res_sb_i)(z9), Jsbi, atol=2e-3)
    assert np.allclose(jax.jacfwd(res_pose_j)(z6), Jpj, atol=2e-3)
    assert np.allclose(jax.jacfwd(res_sb_j)(z9), Jsbj, atol=2e-3)
    # translation / velocity / bias rows must be essentially exact
    assert np.allclose(jax.jacfwd(res_pose_i)(z6)[0:3, 0:3], Jpi[0:3, 0:3], atol=1e-10)
    assert np.allclose(jax.jacfwd(res_sb_j)(z9)[9:15], Jsbj[9:15], atol=1e-12)


def test_reprojection_factor_jacobians():
    rng = np.random.default_rng(1)
    qic = rand_quat(rng)
    tic = jnp.asarray(rng.standard_normal(3) * 0.05)
    Pi = jnp.asarray(rng.standard_normal(3))
    Qi = rand_quat(rng)
    Pj = Pi + jnp.asarray(rng.standard_normal(3) * 0.3)
    Qj = lie.quat_normalize(lie.quat_mul(Qi, lie.so3_exp_quat(
        jnp.asarray(rng.standard_normal(3) * 0.2))))
    inv_dep = jnp.asarray(0.35)
    pts_i = jnp.asarray([0.2, -0.1, 1.0])
    # generate a consistent-ish observation in frame j
    pc_i = pts_i / inv_dep
    pw = lie.quat_rotate(Qi, lie.quat_rotate(qic, pc_i) + tic) + Pi
    pc_j = lie.quat_rotate(lie.quat_conj(qic),
                           lie.quat_rotate(lie.quat_conj(Qj), pw - Pj) - tic)
    pts_j = jnp.concatenate([pc_j[:2] / pc_j[2] + 0.01, jnp.ones(1)])

    Jd, Jpi, Jpj, Jext = factors.reproj_jacobians(
        inv_dep, Pi, Qi, Pj, Qj, tic, qic, pts_i, pts_j)

    def res(d_dep, d_i, d_j, d_ext):
        P_i, Q_i = pose_plus(Pi, Qi, d_i)
        P_j, Q_j = pose_plus(Pj, Qj, d_j)
        t_ic = tic + d_ext[:3]
        q_ic = lie.quat_normalize(lie.quat_mul(qic, lie.so3_exp_quat(d_ext[3:6])))
        return factors.reproj_residual(inv_dep + d_dep[0], P_i, Q_i, P_j, Q_j,
                                       t_ic, q_ic, pts_i, pts_j)

    z1, z6 = jnp.zeros(1), jnp.zeros(6)
    args = (z1, z6, z6, z6)
    assert np.allclose(jax.jacfwd(res, 0)(*args), Jd, atol=1e-9)
    assert np.allclose(jax.jacfwd(res, 1)(*args), Jpi, atol=1e-9)
    assert np.allclose(jax.jacfwd(res, 2)(*args), Jpj, atol=1e-9)
    assert np.allclose(jax.jacfwd(res, 3)(*args), Jext, atol=1e-9)


def test_reprojection_xyz_jacobians():
    rng = np.random.default_rng(2)
    qic = lie.quat_identity()
    tic = jnp.zeros(3)
    Pi = jnp.asarray(rng.standard_normal(3))
    Qi = rand_quat(rng)
    pw = Pi + lie.quat_rotate(Qi, jnp.asarray([0.3, -0.2, 4.0]))
    obs = jnp.asarray([0.28, -0.19])

    J_xyz, J_pose = factors.reproj_xyz_jacobians(pw, Pi, Qi, tic, qic, obs)

    def res(d_xyz, d_pose):
        P, Q = pose_plus(Pi, Qi, d_pose)
        return factors.reproj_xyz_residual(pw + d_xyz, P, Q, tic, qic, obs)

    z3, z6 = jnp.zeros(3), jnp.zeros(6)
    assert np.allclose(jax.jacfwd(res, 0)(z3, z6), J_xyz, atol=1e-9)
    assert np.allclose(jax.jacfwd(res, 1)(z3, z6), J_pose, atol=1e-9)


def test_se3_prior_jacobian():
    rng = np.random.default_rng(3)
    Qp = rand_quat(rng)
    Pp = jnp.asarray(rng.standard_normal(3))
    Qi = lie.quat_normalize(lie.quat_mul(Qp, lie.so3_exp_quat(
        jnp.asarray(rng.standard_normal(3) * 0.3))))
    Pi = Pp + jnp.asarray(rng.standard_normal(3) * 0.2)

    J = factors.se3_prior_jacobian(Pi, Qi, Pp, Qp)

    def res(d):
        P, Q = pose_plus(Pi, Qi, d)
        return factors.se3_prior_residual(P, Q, Pp, Qp)

    assert np.allclose(jax.jacfwd(res)(jnp.zeros(6)), J, atol=1e-9)


def test_loss_functions_match_reference_formulas():
    e2 = jnp.asarray(4.0)
    # cauchy, delta=1: rho = log(1+e2), rho' = 1/(1+e2)
    r0, r1, r2 = factors.cauchy_rho(e2, 1.0)
    assert np.isclose(r0, np.log(5.0))
    assert np.isclose(r1, 0.2)
    assert np.isclose(r2, -0.04)
    # huber outlier branch, delta=1: rho = 2*sqrt(e2)-1
    h0, h1, h2 = factors.huber_rho(e2, 1.0)
    assert np.isclose(h0, 3.0)
    assert np.isclose(h1, 0.5)
    assert np.isclose(h2, -0.0625)
    # huber inlier branch
    h0, h1, h2 = factors.huber_rho(jnp.asarray(0.25), 1.0)
    assert np.isclose(h0, 0.25) and np.isclose(h1, 1.0) and np.isclose(h2, 0.0)
