"""Window-solver regression tests on the self-contained synthetic problem
(vio_tpu/testing.py): LM convergence to ground truth, padded-slot NaN
safety (the inf·mask=NaN Hessian-poisoning bug), and marginalization-prior
structure."""
import numpy as np
import jax.numpy as jnp

from vio_tpu import testing
from vio_tpu.solver import lm, marginalize
from vio_tpu.solver import window as W


def test_solve_window_converges_to_gt():
    from vio_tpu.utils import lie
    states, f, gt = testing.make_window_problem(
        window_size=6, max_features=64, dtype=jnp.float64, perturb=0.02)
    out, bp, ep, stats = lm.solve_window(states, f, max_iter=15)
    assert float(stats["chi2"]) < 1e-6 * float(stats["chi2_init"])
    # the problem has the VIO 4-dof gauge freedom (yaw + translation);
    # re-anchor frame 0 like the estimator's double2vector before comparing
    ypr0_gt = np.asarray(lie.mat_to_ypr(lie.quat_to_mat(gt.Qs[0])))
    ypr0 = np.asarray(lie.mat_to_ypr(lie.quat_to_mat(out.Qs[0])))
    rot = np.asarray(lie.ypr_to_mat(jnp.asarray(
        [ypr0_gt[0] - ypr0[0], 0.0, 0.0])))
    Ps = np.asarray(out.Ps)
    Ps_fix = (Ps - Ps[0]) @ rot.T + np.asarray(gt.Ps)[0]
    # 5 mm: residual gauge-adjacent directions (scale over a 0.2 s window)
    # are weakly observable, so the optimum need not coincide with GT exactly
    assert np.abs(Ps_fix - np.asarray(gt.Ps)).max() < 5e-3, \
        np.abs(Ps_fix - np.asarray(gt.Ps)).max()
    assert np.abs(np.asarray(out.inv_dep)[np.asarray(f.feat_valid)] -
                  np.asarray(gt.inv_dep)[np.asarray(f.feat_valid)]).max() < 2e-3


def test_padded_features_do_not_poison_hessian():
    """Regression: invalid slots with inv_dep=0 once produced inf·0=NaN in
    the masked Jacobians, silently rejecting every LM step while chi²
    stayed finite."""
    states, f, gt = testing.make_window_problem(
        window_size=4, max_features=64, dtype=jnp.float64, perturb=0.01)
    # force the pathological padding the estimator once produced
    inv = np.asarray(states.inv_dep).copy()
    inv[~np.asarray(f.feat_valid)] = 0.0
    states = states._replace(inv_dep=jnp.asarray(inv))
    n = W.assemble(states, f)
    assert np.isfinite(np.asarray(n.Hpp)).all()
    assert np.isfinite(np.asarray(n.bp)).all()
    out, _, _, stats = lm.solve_window(states, f, max_iter=8)
    assert int(stats["iterations"]) > 0
    assert float(stats["chi2"]) < float(stats["chi2_init"])


def test_marginalize_old_prior_structure():
    states, f, gt = testing.make_window_problem(
        window_size=4, max_features=32, dtype=jnp.float64, perturb=0.0)
    Hp, bp, errp, Jtp = marginalize.marginalize_old(states, f)
    Hp = np.asarray(Hp)
    P = Hp.shape[0]
    # symmetric PSD
    assert np.allclose(Hp, Hp.T, atol=1e-8)
    w = np.linalg.eigvalsh(Hp)
    assert w.min() > -1e-6 * max(w.max(), 1.0)
    # the (shifted-out) last frame block is empty after eviction padding
    assert np.abs(Hp[P - 15:, :]).max() < 1e-12
    # sqrt-form consistency: Jtp' structure reproduces Hp
    # (err = -J⁻ᵀ b ⇒ JᵀJ = Hp on the active block)
    n_keep = P - 15
    # marginalizing frame 0 must couple the remaining frames to each other
    blk01 = Hp[6:12, 21:27]
    assert np.abs(blk01).max() > 1e-6
