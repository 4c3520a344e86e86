"""Online camera-IMU extrinsic rotation calibration (hand-eye).

TPU-native re-derivation of the reference's InitialEXRotation
(reference: vins-mono/src/initial/initial_ex_rotation.cpp:11-110
CalibrationExRotation): stack the quaternion Sylvester constraint
L(q_cam) − R(q_imu) over frame pairs, Huber-weight by the angular
disagreement under the current estimate, and read the rotation off the
SVD null vector.  Accept when the second-smallest singular value of the
stacked system exceeds 0.25 with ≥ window_size pairs.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..utils import lie


def _qleft(q):
    """Full 4x4 left-multiplication matrix in (x,y,z,w) layout:
    q ⊗ p = L(q) p."""
    x, y, z, w = q
    return np.array([
        [w, -z, y, x],
        [z, w, -x, y],
        [-y, x, w, z],
        [-x, -y, -z, w],
    ])


def _qright(p):
    """Full 4x4 right-multiplication matrix: q ⊗ p = R(p) q."""
    x, y, z, w = p
    return np.array([
        [w, z, -y, x],
        [-z, w, x, y],
        [y, -x, w, z],
        [-x, -y, -z, w],
    ])


class ExtrinsicRotationCalibrator:
    """Accumulates camera/IMU relative-rotation pairs and solves R_ic."""

    def __init__(self, window_size: int = 10):
        self.window_size = window_size
        self.R_cam = []     # relative camera rotations R_ck_ck+1
        self.R_imu = []     # relative body rotations (preintegrated delta_q)
        self.ric = np.eye(3)

    def add_pair(self, R_cam_rel: np.ndarray, R_imu_rel: np.ndarray):
        self.R_cam.append(np.asarray(R_cam_rel))
        self.R_imu.append(np.asarray(R_imu_rel))

    def solve(self, reweight_iters: int = 2):
        """Returns (ok, R_ic).  (initial_ex_rotation.cpp:11-66).

        The reference re-solves once per incoming frame, so its Huber
        weights always use the previous frame's estimate; a one-shot call
        here iterates `reweight_iters` times to the same effect."""
        n = len(self.R_cam)
        if n < 1:
            return False, self.ric
        ok = False
        for _ in range(reweight_iters):
            ok = self._solve_once()
        return ok, self.ric

    def _solve_once(self):
        n = len(self.R_cam)
        A = np.zeros((4 * n, 4))
        for i in range(n):
            q_cam = np.asarray(lie.mat_to_quat(jnp.asarray(self.R_cam[i])))
            q_imu = np.asarray(lie.mat_to_quat(jnp.asarray(self.R_imu[i])))
            # predicted camera rotation under current ric
            R_pred = self.ric.T @ self.R_imu[i] @ self.ric
            q_pred = np.asarray(lie.mat_to_quat(jnp.asarray(R_pred)))
            cosang = min(1.0, abs(float(np.dot(q_pred, q_cam))))
            ang_deg = np.degrees(2.0 * np.arccos(cosang))
            huber = 1.0 if ang_deg <= 5.0 else 5.0 / max(ang_deg, 1e-9)
            A[4 * i:4 * i + 4] = huber * (_qleft(q_cam) - _qright(q_imu))
        _, s, Vt = np.linalg.svd(A)
        # null vector x satisfies q_cam = x ⊗ q_imu ⊗ x⁻¹, i.e. x = q_cb
        # (imu→camera); ric (camera→imu) is its inverse
        # (initial_ex_rotation.cpp:58-60)
        q_cb = Vt[-1] / np.linalg.norm(Vt[-1])
        R_cb = np.asarray(lie.quat_to_mat(jnp.asarray(q_cb)))
        self.ric = R_cb.T
        return n >= self.window_size and s[2] > 0.25
