"""Generic dense LM solver with Nielsen and ALPHA λ-strategies.

Re-derivation of the GENERIC_PROBLEM path of the reference solver lineage
(reference: 13-vio-bundle-adjustment/src/curve_fitting/src/backend/problem.cc:
307-395 GetChiSquaredAndRho / IsGoodStepInLMNielsen / IsGoodStepInLMAlpha;
17-.../problem.cc:394-404 dense LDLT path).  Used for curve fitting, the SfM
bootstrap BA, and the pose graph — any problem small enough for one dense H.

The caller supplies pure functions; the loop is host-side Python around
jitted callbacks (these problems run once, not per frame).
"""
from __future__ import annotations

from typing import Callable, NamedTuple

import jax.numpy as jnp
import numpy as np


class LMLog(NamedTuple):
    chi2: list
    lam: list


def lm_solve_dense(normal_fn: Callable, chi2_fn: Callable, plus_fn: Callable,
                   x0, max_iter: int = 50, strategy: str = "nielsen",
                   stop_delta_chi: float = 1e-5, verbose: bool = False,
                   log_csv: str | None = None):
    """Minimize 0.5·Σ chi² with LM.

    normal_fn(x) -> (H, b, chi2)   — assembled normal equations (chi2 already
                                     0.5-scaled like the reference's Solve)
    chi2_fn(x)   -> chi2           — residual-only evaluation
    plus_fn(x, dx) -> x            — local update
    """
    x = x0
    H, b, chi = normal_fn(x)
    H = np.asarray(H)
    b = np.asarray(b)
    chi = float(chi)

    max_diag = min(float(np.max(np.abs(np.diag(H)))), 5e10)
    lam = 1e-5 * max_diag
    ni = 2.0
    last_chi = 1e20
    log = LMLog(chi2=[chi], lam=[lam])

    it = 0
    stop = False
    while not stop and it < max_iter:
        one_step_success = False
        false_cnt = 0
        while not one_step_success and false_cnt < 10:
            dx = np.linalg.solve(H + lam * np.eye(H.shape[0]), b)

            def chi_and_rho(alpha):
                scale = 1e-6 + 0.5 * float((alpha * dx) @ (lam * (alpha * dx) + b))
                x_new = plus_fn(x, jnp.asarray(alpha * dx))
                c = float(chi2_fn(x_new))
                return x_new, c, (chi - c) / scale

            if strategy == "nielsen":
                x_new, temp_chi, rho = chi_and_rho(1.0)
                if rho > 0 and np.isfinite(temp_chi):
                    alpha = min(1.0 - (2.0 * rho - 1.0) ** 3, 2.0 / 3.0)
                    lam *= max(1.0 / 3.0, alpha)
                    ni = 2.0
                    x, chi = x_new, temp_chi
                    one_step_success = True
                else:
                    lam *= ni
                    ni *= 2.0
                    false_cnt += 1
            elif strategy == "alpha":
                # (13-.../problem.cc:364-395 IsGoodStepInLMAlpha)
                _, proposed_chi, _ = chi_and_rho(1.0)
                product = float(b @ dx)
                # the 13-reference evaluates chi² UNhalved here; ours carry
                # the 0.5, so the (proposed-chi)/product term needs no extra ½.
                # Clamped into (1e-3, 1]: the raw formula collapses to ~0 when
                # the full step wildly overshoots (e.g. exp curves), which in
                # the reference locks λ at +inf and stalls the solve.
                alpha = 1.0 / ((proposed_chi - chi) / product + 2.0)
                alpha = min(1.0, max(alpha, 1e-3))
                x_new, temp_chi, rho = chi_and_rho(alpha)
                if rho > 0 and np.isfinite(temp_chi):
                    lam = max(lam / (1.0 + alpha), 1e-7)
                    x, chi = x_new, temp_chi
                    one_step_success = True
                else:
                    lam += abs(temp_chi - chi) / (2.0 * alpha)
                    false_cnt += 1
            else:
                raise ValueError(f"unknown strategy {strategy}")

            if one_step_success:
                H, b, chi = normal_fn(x)
                H = np.asarray(H)
                b = np.asarray(b)
                chi = float(chi)
        it += 1
        log.chi2.append(chi)
        log.lam.append(lam)
        if verbose:
            print(f"iter {it}: chi2={chi:.6e} lambda={lam:.3e}")
        if last_chi - chi < stop_delta_chi:
            stop = True
        last_chi = chi
    if log_csv:
        # per-iteration optimization log, the 13-assignment's
        # curve_fitting_LM_log__<strategy>.csv (problem.cc:82-152)
        with open(log_csv, "w") as fh:
            fh.write("iter,chi2,lambda\n")
            for i, (c, l) in enumerate(zip(log.chi2, log.lam)):
                fh.write(f"{i},{c},{l}\n")
    return x, dict(chi2=chi, iterations=it, log=log)
