"""Allan-variance calibration test — parity with the reference's published
results (reference: 12-imu-calibration/README.md:79-105 — gyro noise
estimated 0.01468 vs GT 0.015, acc 0.01880 vs 0.019; bias RW recovered to
order of magnitude)."""
import numpy as np

from vio_tpu.calib import allan


def _imu_noise(sigma_c, bias_sigma, n, dt, seed):
    """The simulator's noise model (reference simulator imu.cpp:50-74):
    white sigma_c/sqrt(dt) + random-walk bias with increments
    bias_sigma*sqrt(dt)."""
    rng = np.random.default_rng(seed)
    bias = np.cumsum(bias_sigma * np.sqrt(dt) * rng.standard_normal(n))
    return sigma_c / np.sqrt(dt) * rng.standard_normal(n) + bias


def test_allan_gyro_noise_density():
    dt = 1.0 / 200.0
    x = _imu_noise(0.015, 1e-5, 400_000, dt, seed=1)
    taus, avar = allan.allan_variance(x, dt)
    fit = allan.fit_allan_params(taus, np.sqrt(avar))
    # reference accuracy: 0.01468 vs 0.015 → accept 10%
    assert abs(fit["N"] - 0.015) / 0.015 < 0.10, fit


def test_allan_acc_noise_density():
    # 900k samples like the reference's recording (the bias-RW regime only
    # becomes identifiable above ~200 s of averaging time)
    dt = 1.0 / 200.0
    x = _imu_noise(0.019, 1e-4, 900_000, dt, seed=2)
    taus, avar = allan.allan_variance(x, dt)
    fit = allan.fit_allan_params(taus, np.sqrt(avar))
    assert abs(fit["N"] - 0.019) / 0.019 < 0.10, fit
    # bias-RW regime: K, B and R are mutually degenerate over a finite tau
    # span (the reference itself recovered K only to ~3.5x, README.md:100),
    # so assert the reconstructed slow-regime variance at tau=250 s instead
    tau = 250.0
    slow = fit["B"] ** 2 + fit["K"] ** 2 * tau + fit["R"] ** 2 * tau ** 2
    true_slow = (1e-4) ** 2 * tau
    assert true_slow / 9 < slow < true_slow * 9, (slow, true_slow, fit)


def test_allan_white_noise_slope():
    """Pure white noise: Allan deviation must fall as tau^-1/2."""
    dt = 0.005
    x = _imu_noise(0.02, 0.0, 200_000, dt, seed=3)
    taus, avar = allan.allan_variance(x, dt)
    adev = np.sqrt(avar)
    sel = (taus > 0.01) & (taus < 1.0)
    slope = np.polyfit(np.log(taus[sel]), np.log(adev[sel]), 1)[0]
    assert abs(slope + 0.5) < 0.1, slope
