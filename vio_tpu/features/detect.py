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
    box = (1.0 / window,) * window          # separable box filter
    sxx = pyramid._sepcorr(gx * gx, box, box)
    syy = pyramid._sepcorr(gy * gy, box, box)
    sxy = pyramid._sepcorr(gx * gy, box, box)
    tr = sxx + syy
    det_disc = jnp.sqrt(jnp.maximum((sxx - syy) ** 2 + 4.0 * sxy * sxy, 0.0))
    return 0.5 * (tr - det_disc)      # λ_min


def _maxpool_same(x, r: int):
    # separable max-pool: two 1-D passes instead of one (2r+1)^2 window —
    # identical result (max is separable), ~(2r+1)/2 x less work, and
    # XLA:CPU's reduce_window is naive O(k) per pixel per pass (a 31x31
    # 2-D window cost ~1 s/frame at 640^2, the detect hot spot)
    x = jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, window_dimensions=(2 * r + 1, 1),
        window_strides=(1, 1), padding="SAME")
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, window_dimensions=(1, 2 * r + 1),
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
    resp_src = jnp.where(ok, resp, 0.0)
    resp = jnp.where(ok, resp, -jnp.inf)

    # NMS at the min-dist radius (replaces the sequential mask loop);
    # a surviving peak is the max of its (2·min_dist+1)² neighborhood,
    # giving ≥ min_dist spacing like cv::goodFeaturesToTrack(minDistance).
    # The occupancy mask is applied AFTER the peak test (as OpenCV masks
    # candidates, not the response): masking the response first manufactures
    # false peaks at mask boundaries — blob/corner skirts ~1 px off any
    # real feature, which then poison the track with constant offsets.
    is_peak = resp >= _maxpool_same(resp, min_dist)
    if occupancy_mask is not None:
        is_peak &= ~occupancy_mask
    resp = jnp.where(is_peak, resp, -jnp.inf)
    # quality gate relative to the GLOBAL response max (OpenCV semantics:
    # qualityLevel · maxVal over the whole image, not over survivors)
    thresh = quality * jnp.max(resp_src)

    flat = resp.reshape(-1)
    score, idx = jax.lax.top_k(flat, max_corners)
    yi = idx // W
    xi = idx % W
    valid = score > jnp.maximum(thresh, 0.0)

    # sub-pixel localization: 1-D quadratic fit through the response peak
    # in x and y (cv::cornerSubPix analog, cheap gather form).  Detections
    # at integer pixels otherwise carry a ~0.5 px constant offset per
    # feature for the whole track.  Uses the PRE-NMS response (peak
    # neighbors are -inf in the NMS'd map).
    resp_f = resp_src

    def sub(axis_idx, other_idx, along_x):
        if along_x:
            c0 = resp_f[other_idx, jnp.maximum(axis_idx - 1, 0)]
            c1 = resp_f[other_idx, axis_idx]
            c2 = resp_f[other_idx, jnp.minimum(axis_idx + 1, W - 1)]
        else:
            c0 = resp_f[jnp.maximum(axis_idx - 1, 0), other_idx]
            c1 = resp_f[axis_idx, other_idx]
            c2 = resp_f[jnp.minimum(axis_idx + 1, H - 1), other_idx]
        denom = c0 - 2.0 * c1 + c2
        off = jnp.where(jnp.abs(denom) > 1e-12,
                        0.5 * (c0 - c2) / jnp.where(jnp.abs(denom) > 1e-12,
                                                    denom, 1.0), 0.0)
        return jnp.clip(off, -0.5, 0.5)

    dx = sub(xi, yi, True)
    dy = sub(yi, xi, False)
    xx = xi.astype(img.dtype) + dx
    yy = yi.astype(img.dtype) + dy
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
