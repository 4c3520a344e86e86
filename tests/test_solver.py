"""Solver known-answer tests, mirroring the reference's experiment suite:

* curve fitting with Nielsen + ALPHA λ-strategies
  (13-vio-bundle-adjustment curve_fitting.cpp + problem.cc:332-395)
* 3x3 chain marginalization (15-vio-backend problem.cc:571 TestMarginalize)
* BA Hessian gauge nullspace = 7 (14-sliding-window hessian_nullspace_test.cpp)
* MonoBA convergence with SE3 gauge prior (15-vio-backend TestMonoBA.cpp)
"""
import jax
import jax.numpy as jnp
import numpy as np

from vio_tpu import factors
from vio_tpu.solver import generic, marginalize
from vio_tpu.utils import lie


# ---------------------------------------------------------------------------
# curve fitting: y = exp(a x² + b x + c) + n
# ---------------------------------------------------------------------------

def _curve_problem(seed=0, N=1000, sigma=1.0, gt=(1.0, 2.0, 1.0), kind="exp"):
    rng = np.random.default_rng(seed)
    xs = np.arange(N) / N
    z = gt[0] * xs ** 2 + gt[1] * xs + gt[2]
    ys = (np.exp(z) if kind == "exp" else z) + sigma * rng.standard_normal(N)
    xs = jnp.asarray(xs)
    ys = jnp.asarray(ys)

    def model(abc):
        z = abc[0] * xs ** 2 + abc[1] * xs + abc[2]
        f = jnp.exp(z) if kind == "exp" else z
        df = f if kind == "exp" else jnp.ones_like(f)
        return f, df

    @jax.jit
    def normal_fn(abc):
        f, df = model(abc)
        r = f - ys
        J = jnp.stack([df * xs ** 2, df * xs, df], axis=-1)  # (N, 3)
        return J.T @ J, -J.T @ r, 0.5 * jnp.sum(r * r)

    @jax.jit
    def chi2_fn(abc):
        f, _ = model(abc)
        return 0.5 * jnp.sum((f - ys) ** 2)

    plus = lambda x, dx: x + dx
    return normal_fn, chi2_fn, plus


def test_curve_fitting_nielsen():
    normal_fn, chi2_fn, plus = _curve_problem()
    x, stats = generic.lm_solve_dense(normal_fn, chi2_fn, plus,
                                      jnp.zeros(3), max_iter=50)
    assert np.allclose(np.asarray(x), [1.0, 2.0, 1.0], atol=0.12)


def test_curve_fitting_alpha_strategy():
    """ALPHA λ-strategy on the poly curve (the 13-assignment's second
    problem type — on the exp curve the raw alpha formula degenerates when
    the full GN step overshoots, see generic.py)."""
    normal_fn, chi2_fn, plus = _curve_problem(kind="poly", sigma=0.2)
    x, stats = generic.lm_solve_dense(normal_fn, chi2_fn, plus,
                                      jnp.zeros(3), max_iter=50,
                                      strategy="alpha")
    assert np.allclose(np.asarray(x), [1.0, 2.0, 1.0], atol=0.12)


# ---------------------------------------------------------------------------
# 3x3 chain marginalization (TestMarginalize known answer)
# ---------------------------------------------------------------------------

def test_marginalize_chain_3x3():
    d1, d2, d3 = 0.01, 0.04, 0.09
    H = np.array([
        [1 / d1, -1 / d1, 0.0],
        [-1 / d1, 1 / d1 + 1 / d2 + 1 / d3, -1 / d3],
        [0.0, -1 / d3, 1 / d3],
    ])
    b = np.array([1.0, 2.0, 3.0])
    # marginalize variable 1: permute to the end, schur
    perm = np.array([0, 2, 1])
    Hp = jnp.asarray(H[perm][:, perm])
    bp = jnp.asarray(b[perm])
    H_new, b_new = marginalize._eigh_schur(Hp, bp, 2)
    # analytic schur complement
    a = H[1, 1]
    expected_H = H[np.ix_([0, 2], [0, 2])] - \
        np.outer(H[[0, 2], 1], H[1, [0, 2]]) / a
    expected_b = b[[0, 2]] - H[[0, 2], 1] * b[1] / a
    assert np.allclose(H_new, expected_H, atol=1e-9)
    assert np.allclose(b_new, expected_b, atol=1e-9)
    # marginalizing a chain couples the two remaining variables
    assert abs(float(H_new[0, 1])) > 1.0


def test_sqrt_form_roundtrip():
    rng = np.random.default_rng(1)
    A = rng.standard_normal((8, 8))
    H = jnp.asarray(A @ A.T + 0.1 * np.eye(8))
    b = jnp.asarray(rng.standard_normal(8))
    Jt_inv, err, H_clean = marginalize._sqrt_form(H, b)
    assert np.allclose(H_clean, H, atol=1e-8)
    # err = -Jt⁻ᵀ... consistency: J.T @ J = H and J.T @ (-err) ≈ b... here
    # err = -Jt_inv @ b with Jt_inv = S^-1/2 Vᵀ, so ‖err‖² = bᵀ H⁻¹ b
    expect = float(b @ np.linalg.solve(np.asarray(H), np.asarray(b)))
    assert np.isclose(float(err @ err), expect, rtol=1e-8)


# ---------------------------------------------------------------------------
# gauge nullspace: 10 poses / 20 landmarks monocular BA Hessian has exactly
# 7 near-zero singular values (6 gauge + 1 scale)
# ---------------------------------------------------------------------------

def _arc_scene(n_pose=10, n_lm=20, seed=3, arc_step=None):
    """Poses on an R=8 arc looking at landmarks in [-4,4]²×[8,10]
    (15-vio-backend TestMonoBA.cpp:28-87 GetSimDataInWorldFrame)."""
    rng = np.random.default_rng(seed)
    R_arc = 8.0
    if arc_step is None:
        arc_step = 2 * np.pi / (4 * n_pose)
    poses = []
    for n in range(n_pose):
        theta = n * arc_step
        Rwb = np.asarray(lie.so3_exp_mat(jnp.asarray([0.0, 0.0, theta])))
        twb = np.array([R_arc * np.cos(theta) - R_arc, R_arc * np.sin(theta), 0.0])
        poses.append((twb, Rwb))
    pts = np.stack([rng.uniform(-4, 4, n_lm),
                    rng.uniform(-4, 4, n_lm),
                    rng.uniform(8, 10, n_lm)], axis=1)
    return poses, pts


def test_hessian_nullspace_is_7():
    poses, pts = _arc_scene()
    n_pose, n_lm = len(poses), len(pts)
    qic = lie.quat_identity()
    tic = jnp.zeros(3)
    P = 6 * n_pose + 3 * n_lm
    H = np.zeros((P, P))
    for i, (twb, Rwb) in enumerate(poses):
        Q = lie.mat_to_quat(jnp.asarray(Rwb))
        t = jnp.asarray(twb)
        for l in range(n_lm):
            pc = Rwb.T @ (pts[l] - twb)
            if pc[2] < 0.1:
                continue
            obs = jnp.asarray(pc[:2] / pc[2])
            J_xyz, J_pose = factors.reproj_xyz_jacobians(
                jnp.asarray(pts[l]), t, Q, tic, qic, obs)
            J = np.zeros((2, P))
            J[:, 6 * i:6 * i + 6] = np.asarray(J_pose)
            J[:, 6 * n_pose + 3 * l:6 * n_pose + 3 * l + 3] = np.asarray(J_xyz)
            H += J.T @ J
    sv = np.linalg.svd(H, compute_uv=False)
    n_null = int(np.sum(sv < sv[0] * 1e-10))
    assert n_null == 7, f"expected 7 gauge dof, got {n_null} (sv tail {sv[-9:]})"


# ---------------------------------------------------------------------------
# MonoBA: 3 poses / 20 landmarks, inverse depth, SE3 prior gauge (weight 1e4)
# ---------------------------------------------------------------------------

def _mono_ba(sigma_obs, stop_delta_chi=1e-5):
    rng = np.random.default_rng(5)
    poses, pts = _arc_scene(n_pose=3, n_lm=20, seed=5,
                            arc_step=2 * np.pi / 12)  # 30° apart, as in ref
    qic = lie.quat_identity()
    tic = jnp.zeros(3)

    # observations (normalized, sigma = 1e-3 like TestMonoBA.cpp:70)
    obs = np.zeros((3, 20, 2))
    gt_invdep = np.zeros(20)
    for i, (twb, Rwb) in enumerate(poses):
        for l in range(20):
            pc = Rwb.T @ (pts[l] - twb)
            obs[i, l] = pc[:2] / pc[2] + sigma_obs * rng.standard_normal(2)
            if i == 0:
                gt_invdep[l] = 1.0 / pc[2]

    Qs_gt = [np.asarray(lie.mat_to_quat(jnp.asarray(R))) for _, R in poses]
    Ts_gt = [t for t, _ in poses]

    # initial guess: true poses, noisy inverse depth (TestMonoBA perturbs depth)
    invdep0 = gt_invdep * (1.0 + 0.3 * rng.standard_normal(20))

    def unpack(x):
        Ps = x[:9].reshape(3, 3)
        thetas = x[9:18].reshape(3, 3)
        Qs = [lie.quat_normalize(lie.quat_mul(jnp.asarray(Qs_gt[i]),
                                              lie.so3_exp_quat(thetas[i])))
              for i in range(3)]
        invd = x[18:]
        return Ps, Qs, invd

    # param: [t0,t1,t2 (9), dtheta0..2 (9), invdep (20)] — rotations as local
    # increments around the initial guess
    x0 = jnp.concatenate([jnp.asarray(np.concatenate(Ts_gt)), jnp.zeros(9),
                          jnp.asarray(invdep0)])

    # perturb the poses too (translation + rotation), except gauge-prior anchors
    x0 = x0.at[6:9].add(jnp.asarray(rng.standard_normal(3) * 0.1))
    x0 = x0.at[15:18].add(jnp.asarray(rng.standard_normal(3) * 0.05))

    prior_w = 1e4

    def residuals(x):
        Ps, Qs, invd = unpack(x)
        rs = []
        for l in range(20):
            pts_i = jnp.asarray([obs[0, l, 0], obs[0, l, 1], 1.0])
            for j in (1, 2):
                pts_j = jnp.asarray([obs[j, l, 0], obs[j, l, 1], 1.0])
                rs.append(factors.reproj_residual(
                    invd[l], Ps[0], Qs[0], Ps[j], Qs[j], tic, qic, pts_i, pts_j))
        # SE3 priors on poses 0 and 1 (weight 1e4)
        for i in (0, 1):
            rp = factors.se3_prior_residual(Ps[i], Qs[i],
                                            jnp.asarray(Ts_gt[i]),
                                            jnp.asarray(Qs_gt[i]))
            rs.append(jnp.sqrt(prior_w) * rp)
        return jnp.concatenate(rs)

    @jax.jit
    def normal_fn(x):
        r = residuals(x)
        J = jax.jacfwd(residuals)(x)
        return J.T @ J, -J.T @ r, 0.5 * jnp.sum(r * r)

    @jax.jit
    def chi2_fn(x):
        r = residuals(x)
        return 0.5 * jnp.sum(r * r)

    x, stats = generic.lm_solve_dense(normal_fn, chi2_fn, lambda x, dx: x + dx,
                                      x0, max_iter=100,
                                      stop_delta_chi=stop_delta_chi)
    return np.asarray(x), Ts_gt, gt_invdep


def test_mono_ba_noise_free_is_exact():
    """With σ_obs = 0 the optimum IS the ground truth — sharp correctness
    check of factors + LM (any Jacobian/update bug shifts the optimum)."""
    x, Ts_gt, gt_invdep = _mono_ba(sigma_obs=0.0, stop_delta_chi=1e-16)
    assert np.allclose(x[6:9], Ts_gt[2], atol=1e-7), x[6:9] - Ts_gt[2]
    assert np.allclose(x[18:], gt_invdep, rtol=1e-7)


def test_mono_ba_converges_to_ground_truth():
    """σ_obs = 1e-3 as in TestMonoBA.cpp — recovery to the noise floor
    (depth-direction uncertainty amplifies ×~30)."""
    x, Ts_gt, gt_invdep = _mono_ba(sigma_obs=1e-3)
    assert np.allclose(x[6:9], Ts_gt[2], atol=0.06), x[6:9] - Ts_gt[2]
    err = np.abs(x[18:] - gt_invdep) / gt_invdep
    assert np.median(err) < 2e-2


def test_compacted_assembly_matches_grid():
    """window.assemble with a static live-observation cap (n_obs) must
    reproduce the dense-grid normal equations exactly — the compaction is
    a pure gather/re-layout of the same factors (the production estimator
    path, estimator._obs_cap; VERDICT r4 #3 padded-grid tax)."""
    from vio_tpu import testing
    from vio_tpu.solver import lm
    from vio_tpu.solver import window as W

    states, f, _ = testing.make_window_problem(
        window_size=10, max_features=64, imu_per_interval=8,
        dtype=jnp.float64)
    live = int(np.asarray(f.obs_mask & np.asarray(f.feat_valid)[:, None]).sum())
    n_obs = ((live + 255) // 256) * 256
    n0 = W.assemble(states, f, fix_ext=True, loss_delta=1.0)
    n1 = W.assemble(states, f, fix_ext=True, loss_delta=1.0, n_obs=n_obs)
    for name in ("Hpp", "bp", "Hpm", "Hmm", "bm", "chi2"):
        a = np.asarray(getattr(n0, name))
        b = np.asarray(getattr(n1, name))
        scale = max(np.abs(a).max(), 1.0)
        assert np.abs(a - b).max() / scale < 1e-9, name

    s0 = lm.solve_window(states, f, max_iter=10)
    s1 = lm.solve_window(states, f, max_iter=10, n_obs=n_obs)
    assert np.abs(np.asarray(s0[0].Ps) - np.asarray(s1[0].Ps)).max() < 1e-8


def test_compacted_assembly_overflow_keeps_prefix():
    """With n_obs below the live count the compaction keeps the FIRST
    n_obs live cells (documented silent-drop contract) — the result must
    stay finite and the Hessian well-formed."""
    from vio_tpu import testing
    from vio_tpu.solver import window as W

    states, f, _ = testing.make_window_problem(
        window_size=10, max_features=64, imu_per_interval=8)
    n1 = W.assemble(states, f, fix_ext=True, loss_delta=1.0, n_obs=256)
    for leaf in n1:
        assert np.all(np.isfinite(np.asarray(leaf)))
