"""Shi-Tomasi corner detection with min-distance grid NMS, on device.

Replaces cv::goodFeaturesToTrack + the mask-based min-distance selection
loop (reference: vins-mono/src/feature_tracker.cpp:36-79 setMask/addPoints,
:149 goodFeaturesToTrack).  The reference's sequential mask loop becomes a
static max-pool NMS: a corner survives if it is the maximum of its
(2r+1)² neighborhood and above quality_level · global max — then the top-K
responses are taken with a fixed K (static shapes for jit).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from . import pyramid


def shi_tomasi_response(img, window: int = 3):
    """Min-eigenvalue corner response of the structure tensor, box-filtered
    over `window` (the goodFeaturesToTrack score)."""
    gx, gy = pyramid.scharr_gradients(img)
    k = jnp.ones((window, window), img.dtype) / (window * window)
    sxx = pyramid._conv2(gx * gx, k)
    syy = pyramid._conv2(gy * gy, k)
    sxy = pyramid._conv2(gx * gy, k)
    tr = sxx + syy
    det_disc = jnp.sqrt(jnp.maximum((sxx - syy) ** 2 + 4.0 * sxy * sxy, 0.0))
    return 0.5 * (tr - det_disc)      # λ_min


def _maxpool_same(x, r: int):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max,
        window_dimensions=(2 * r + 1, 2 * r + 1),
        window_strides=(1, 1), padding="SAME")


@partial(jax.jit, static_argnames=("max_corners", "min_dist", "border"))
def detect(img, occupancy_mask=None, max_corners: int = 150,
           min_dist: int = 30, quality: float = 0.01, border: int = 8):
    """Top-K Shi-Tomasi corners with min-distance NMS.

    occupancy_mask (H, W) bool: True where detection is FORBIDDEN (the
    reference's circle mask around tracked features, feature_tracker.cpp:36).
    Returns (xy (K, 2) float, score (K,), valid (K,))."""
    H, W = img.shape
    resp = shi_tomasi_response(img)

    row = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
    ok = (row >= border) & (row < H - border) & \
         (col >= border) & (col < W - border)
    if occupancy_mask is not None:
        ok &= ~occupancy_mask
    resp = jnp.where(ok, resp, -jnp.inf)

    # NMS at the min-dist radius (replaces the sequential mask loop);
    # a surviving peak is the max of its (2·min_dist+1)² neighborhood,
    # giving ≥ min_dist spacing like cv::goodFeaturesToTrack(minDistance)
    is_peak = resp >= _maxpool_same(resp, min_dist)
    resp = jnp.where(is_peak, resp, -jnp.inf)
    thresh = quality * jnp.max(resp)

    flat = resp.reshape(-1)
    score, idx = jax.lax.top_k(flat, max_corners)
    yy = (idx // W).astype(img.dtype)
    xx = (idx % W).astype(img.dtype)
    valid = score > jnp.maximum(thresh, 0.0)
    return jnp.stack([xx, yy], axis=-1), score, valid


def occupancy_from_points(shape, xy, valid, min_dist: int):
    """Build the forbidden-region mask from existing track positions —
    a disk of radius min_dist around each (the reference's cv::circle
    mask).  Implemented as a scatter of points + max-pool dilation."""
    H, W = shape
    grid = jnp.zeros((H, W), jnp.float32)
    xi = jnp.clip(xy[:, 0].astype(jnp.int32), 0, W - 1)
    yi = jnp.clip(xy[:, 1].astype(jnp.int32), 0, H - 1)
    grid = grid.at[yi, xi].max(jnp.where(valid, 1.0, 0.0))
    dil = _maxpool_same(grid, min_dist)
    return dil > 0.5
