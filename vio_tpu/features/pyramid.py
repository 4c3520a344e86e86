"""Image pyramid + gradients, fully on device.

Replaces the OpenCV pyramid build inside cv::calcOpticalFlowPyrLK and the
bilinear/Scharr ImageWithGradient of the reference
(reference: 06-frontend-direct-method/01-optical-flow/optical_flow.cpp:10-84,
vins-mono/src/feature_tracker.cpp:113).  Downsampling and gradient filters
are `lax.conv` stencils — XLA fuses and tiles these well on the VPU/MXU; a
hand-written Pallas kernel is reserved for the gather-heavy KLT iteration
(klt.py), not these dense stencils.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def _conv2(img, kernel):
    """Single-channel 2-D correlation with SAME padding; img (H, W)."""
    return jax.lax.conv_general_dilated(
        img[None, None, :, :], kernel[None, None, :, :],
        window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NCHW", "OIHW", "NCHW"))[0, 0]


def downsample2(img):
    """5-tap Gaussian blur + 2× decimation (the classic pyrDown)."""
    k = jnp.asarray([1.0, 4.0, 6.0, 4.0, 1.0], img.dtype) / 16.0
    blurred = _conv2(img, k[:, None] * k[None, :])
    return blurred[::2, ::2]


def build_pyramid(img, levels: int = 3):
    """[level0 (full res), level1 (half), ...]"""
    pyr = [img]
    for _ in range(levels - 1):
        pyr.append(downsample2(pyr[-1]))
    return pyr


def scharr_gradients(img):
    """(gx, gy) with the Scharr 3×3 stencil (the reference's gradient
    operator, optical_flow.cpp ImageWithGradient)."""
    d = jnp.asarray([-1.0, 0.0, 1.0], img.dtype)
    s = jnp.asarray([3.0, 10.0, 3.0], img.dtype) / 16.0
    gx = _conv2(img, s[:, None] * d[None, :])
    gy = _conv2(img, d[:, None] * s[None, :])
    return gx, gy


def central_gradients(img):
    """Simple central differences (matches cv::calcOpticalFlowPyrLK's
    internal derivative scale more closely than Scharr)."""
    gx = 0.5 * (jnp.roll(img, -1, axis=1) - jnp.roll(img, 1, axis=1))
    gy = 0.5 * (jnp.roll(img, -1, axis=0) - jnp.roll(img, 1, axis=0))
    return gx, gy


def bilinear_sample(img, xy):
    """Sample img (H, W) at float positions xy (..., 2) (x=col, y=row),
    with edge clamping.  Pure gather — vmap/jit safe.  Fast on CPU; on
    TPU prefer patch_sample (one-hot MXU matmuls) for patch grids."""
    H, W = img.shape
    x = jnp.clip(xy[..., 0], 0.0, W - 1.001)
    y = jnp.clip(xy[..., 1], 0.0, H - 1.001)
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    fx = x - x0
    fy = y - y0
    i00 = img[y0, x0]
    i01 = img[y0, x0 + 1]
    i10 = img[y0 + 1, x0]
    i11 = img[y0 + 1, x0 + 1]
    return ((1 - fy) * ((1 - fx) * i00 + fx * i01) +
            fy * ((1 - fx) * i10 + fx * i11))
