"""Camera models: pinhole (radtan) + equidistant (fisheye), batched jnp.

TPU-native subset of camodocal (reference:
src/camera_models/camera_models/{PinholeCamera.cc,EquidistantCamera.cc},
factory at CameraFactory.cc:90).  EuRoC and the simulator only need these
two.  Unprojection (``liftProjective``) uses a fixed-iteration inverse
distortion (reference: PinholeCamera.cc:485-512 recursive inverse) so it is
jit/vmap-safe with static shapes.
"""
from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

UNDISTORT_ITERS = 8


@dataclasses.dataclass(frozen=True)
class PinholeCamera:
    """fx, fy, cx, cy with radtan distortion (k1, k2, p1, p2)."""
    fx: float
    fy: float
    cx: float
    cy: float
    k1: float = 0.0
    k2: float = 0.0
    p1: float = 0.0
    p2: float = 0.0
    width: int = 0
    height: int = 0

    def distort(self, p):
        """Apply radtan distortion to normalized coords p (..., 2)."""
        x, y = p[..., 0], p[..., 1]
        r2 = x * x + y * y
        rad = self.k1 * r2 + self.k2 * r2 * r2
        dx = x * rad + 2.0 * self.p1 * x * y + self.p2 * (r2 + 2.0 * x * x)
        dy = y * rad + self.p1 * (r2 + 2.0 * y * y) + 2.0 * self.p2 * x * y
        return p + jnp.stack([dx, dy], axis=-1)

    def project(self, pc):
        """Camera-frame 3D points (..., 3) → pixel coords (..., 2)."""
        pn = pc[..., :2] / pc[..., 2:3]
        pd = self.distort(pn)
        return jnp.stack([self.fx * pd[..., 0] + self.cx,
                          self.fy * pd[..., 1] + self.cy], axis=-1)

    def lift(self, uv):
        """Pixel coords (..., 2) → normalized image-plane coords (..., 2)
        (z=1).  Fixed-point inverse of the distortion, matching the
        reference's recursive undistortion."""
        mx = (uv[..., 0] - self.cx) / self.fx
        my = (uv[..., 1] - self.cy) / self.fy
        pd = jnp.stack([mx, my], axis=-1)
        if self.k1 == 0.0 and self.k2 == 0.0 and self.p1 == 0.0 and self.p2 == 0.0:
            return pd

        def body(_, pu):
            return pd - (self.distort(pu) - pu)

        return jax.lax.fori_loop(0, UNDISTORT_ITERS, body, pd)

    def lift_to_ray(self, uv):
        pn = self.lift(uv)
        return jnp.concatenate([pn, jnp.ones(pn.shape[:-1] + (1,), pn.dtype)], axis=-1)


@dataclasses.dataclass(frozen=True)
class EquidistantCamera:
    """Kannala-Brandt equidistant fisheye: theta-polynomial k2..k5
    (reference: EquidistantCamera.cc)."""
    fx: float
    fy: float
    cx: float
    cy: float
    k2: float = 0.0
    k3: float = 0.0
    k4: float = 0.0
    k5: float = 0.0
    width: int = 0
    height: int = 0

    def _theta_d(self, theta):
        t2 = theta * theta
        return theta * (1.0 + t2 * (self.k2 + t2 * (self.k3 + t2 * (self.k4 + t2 * self.k5))))

    def project(self, pc):
        r = jnp.linalg.norm(pc[..., :2], axis=-1)
        theta = jnp.arctan2(r, pc[..., 2])
        td = self._theta_d(theta)
        scale = td / jnp.maximum(r, 1e-12)
        return jnp.stack([self.fx * scale * pc[..., 0] + self.cx,
                          self.fy * scale * pc[..., 1] + self.cy], axis=-1)

    def lift(self, uv):
        mx = (uv[..., 0] - self.cx) / self.fx
        my = (uv[..., 1] - self.cy) / self.fy
        td = jnp.sqrt(mx * mx + my * my)

        # Newton on the scalar polynomial with analytic derivative.
        theta = td

        def newton(_, theta):
            t2 = theta * theta
            f = self._theta_d(theta) - td
            df = 1.0 + t2 * (3 * self.k2 + t2 * (5 * self.k3 + t2 * (7 * self.k4 + t2 * 9 * self.k5)))
            return theta - f / jnp.maximum(df, 1e-12)

        theta = jax.lax.fori_loop(0, UNDISTORT_ITERS, newton, theta)
        scale = jnp.tan(theta) / jnp.maximum(td, 1e-12)
        return jnp.stack([mx * scale, my * scale], axis=-1)

    def lift_to_ray(self, uv):
        pn = self.lift(uv)
        return jnp.concatenate([pn, jnp.ones(pn.shape[:-1] + (1,), pn.dtype)], axis=-1)
