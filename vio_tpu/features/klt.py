"""Batched pyramidal inverse-compositional Lucas-Kanade optical flow.

Replaces cv::calcOpticalFlowPyrLK (reference:
vins-mono/src/feature_tracker.cpp:113) with the inverse-compositional
formulation the reference derives in its optical-flow assignment
(reference: 06-frontend-direct-method/01-optical-flow/optical_flow.cpp:
144-466 — multi-level, scale 0.5, Gauss-Newton per patch; we use 21×21
patches / 3 levels / fixed iteration counts like the capstone tracker).

All features are tracked as ONE batch: patch extraction is a vmapped
bilinear gather, the 2×2 normal systems are solved in closed form, and the
per-level iteration is a `lax.fori_loop` — fixed shapes, one XLA program.
The template Hessian is precomputed once per level (inverse-compositional),
so each iteration costs one gather + two reductions per feature.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from . import pyramid

PATCH = 21          # cv::calcOpticalFlowPyrLK default window
HALF = PATCH // 2


def _patch_grid(dtype):
    d = jnp.arange(-HALF, HALF + 1, dtype=dtype)
    dx, dy = jnp.meshgrid(d, d)
    return jnp.stack([dx, dy], axis=-1).reshape(-1, 2)    # (P², 2)


def _sample_patches(img, centers):
    """(N, P²) bilinear patches around centers (N, 2)."""
    grid = _patch_grid(img.dtype)
    pts = centers[:, None, :] + grid[None, :, :]          # (N, P², 2)
    return pyramid.bilinear_sample(img, pts)


def _track_level(img0, img1, p0, p1_init, n_iters: int, eps: float):
    """One pyramid level of inverse-compositional LK for all features.

    p0 (N,2): template positions in img0; p1_init: current guesses in img1.
    Returns (p1, converged, residual)."""
    grid = _patch_grid(img0.dtype)
    gx, gy = pyramid.central_gradients(img0)

    T = _sample_patches(img0, p0)                          # (N, P²)
    Gx = _sample_patches(gx, p0)
    Gy = _sample_patches(gy, p0)
    # template normal matrix (N, 2, 2) — computed ONCE (inverse comp.)
    H00 = jnp.sum(Gx * Gx, axis=1)
    H01 = jnp.sum(Gx * Gy, axis=1)
    H11 = jnp.sum(Gy * Gy, axis=1)
    det = H00 * H11 - H01 * H01
    good_H = det > 1e-6
    inv_det = jnp.where(good_H, 1.0 / jnp.where(good_H, det, 1.0), 0.0)

    def body(_, p1):
        I = pyramid.bilinear_sample(img1, p1[:, None, :] + grid[None, :, :])
        r = I - T                                          # (N, P²)
        b0 = jnp.sum(Gx * r, axis=1)
        b1 = jnp.sum(Gy * r, axis=1)
        du = inv_det * (H11 * b0 - H01 * b1)
        dv = inv_det * (-H01 * b0 + H00 * b1)
        # inverse-compositional: template warp inverts onto the target
        return p1 - jnp.stack([du, dv], axis=-1)

    p1 = jax.lax.fori_loop(0, n_iters, body, p1_init)
    I = pyramid.bilinear_sample(img1, p1[:, None, :] + grid[None, :, :])
    res = jnp.mean(jnp.abs(I - T), axis=1)
    return p1, good_H, res


@partial(jax.jit, static_argnames=("levels", "n_iters"))
def track(img0, img1, p0, valid, levels: int = 3, n_iters: int = 10,
          max_residual: float = 25.0):
    """Track features p0 (N,2) from img0 to img1 through a `levels`-deep
    pyramid.  Returns (p1 (N,2), ok (N,), residual (N,))."""
    pyr0 = pyramid.build_pyramid(img0, levels)
    pyr1 = pyramid.build_pyramid(img1, levels)
    scale = 2.0 ** (levels - 1)
    p1 = p0 / scale
    ok = valid
    res = jnp.zeros(p0.shape[0], img0.dtype)
    for lv in range(levels - 1, -1, -1):
        s = 2.0 ** lv
        p1, good_H, res = _track_level(pyr0[lv], pyr1[lv], p0 / s, p1,
                                       n_iters, 0.01)
        ok = ok & good_H
        if lv > 0:
            p1 = p1 * 2.0
    H, W = img0.shape
    inb = (p1[:, 0] >= 1.0) & (p1[:, 0] < W - 1) & \
          (p1[:, 1] >= 1.0) & (p1[:, 1] < H - 1)
    ok = ok & inb & (res < max_residual)
    return p1, ok, res


@partial(jax.jit, static_argnames=("levels", "n_iters"))
def track_fb(img0, img1, p0, valid, levels: int = 3, n_iters: int = 10,
             max_residual: float = 25.0, fb_thresh: float = 0.5):
    """Forward-backward tracking: track 0→1, then 1→0, and require the
    round trip to land within fb_thresh px (a stronger outlier gate than
    the reference's status flags)."""
    p1, ok, res = track(img0, img1, p0, valid, levels, n_iters, max_residual)
    p0_back, ok_b, _ = track(img1, img0, p1, ok, levels, n_iters, max_residual)
    d = jnp.linalg.norm(p0_back - p0, axis=-1)
    return p1, ok & ok_b & (d < fb_thresh), res
