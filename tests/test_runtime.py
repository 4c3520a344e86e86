"""Measurement-runtime tests: the C++ pairing queue (built on demand) and
its Python fallback must agree exactly, and pairing must match the
reference's getMeasurements + interpolation semantics
(reference: vins-mono/src/System.cpp:289-336, 372-396)."""
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

from vio_tpu import runtime

ROOT = Path(__file__).resolve().parent.parent


def _ensure_native():
    if runtime.load_native() is None:
        r = subprocess.run([sys.executable, str(ROOT / "native" / "build.py")],
                           capture_output=True)
        if r.returncode != 0:
            pytest.skip(f"native build failed: {r.stderr.decode()[:200]}")
        import importlib
        importlib.invalidate_caches()
    if runtime.load_native() is None:
        pytest.skip("vio_native not importable after build")
    return runtime.load_native()


def _drive(pairer):
    rng = np.random.default_rng(0)
    imu_t = np.arange(0, 1.0, 0.005)
    acc = rng.standard_normal((len(imu_t), 3))
    gyr = rng.standard_normal((len(imu_t), 3))
    cam_t = np.arange(0.0333, 0.95, 1.0 / 30.0)
    packets = []
    ci = 0
    for i, t in enumerate(imu_t):
        pairer.push_imu(float(t), *acc[i], *gyr[i])
        while ci < len(cam_t) and cam_t[ci] <= t:
            pairer.push_frame(float(cam_t[ci]), ci)
            ci += 1
        while (pkt := pairer.next()) is not None:
            packets.append(pkt)
    return packets


def test_python_fallback_pairing():
    pkts = _drive(runtime.PyMeasurementPairer())
    assert len(pkts) >= 25
    for ft, handle, rows in pkts:
        assert rows, handle
        assert abs(rows[-1][0] - ft) < 1e-12       # boundary interpolation
        ts = [r[0] for r in rows]
        assert all(a < b for a, b in zip(ts, ts[1:]))


def test_native_matches_python():
    native = _ensure_native()
    pk_native = _drive(native.MeasurementPairer())
    pk_py = _drive(runtime.PyMeasurementPairer())
    assert len(pk_native) == len(pk_py)
    for (ta, ha, ra), (tb, hb, rb) in zip(pk_native, pk_py):
        assert ta == tb and ha == hb and len(ra) == len(rb)
        assert np.allclose(np.asarray(ra), np.asarray(rb), atol=1e-14)


def test_native_disorder_rejection():
    native = _ensure_native()
    p = native.MeasurementPairer()
    assert p.push_imu(0.1, 0, 0, 0, 0, 0, 0)
    assert not p.push_imu(0.05, 0, 0, 0, 0, 0, 0)
    assert p.stats()["imu_disorder"] == 1
