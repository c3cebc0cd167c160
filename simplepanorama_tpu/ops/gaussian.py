"""Separable Gaussian filtering with static kernels (XLA convs).

All pyramid sigmas are compile-time constants, so kernels are baked as
numpy weights at trace time and the blur lowers to two 1-D convolutions
that XLA fuses/tiles. Border handling is REFLECT_101 (OpenCV's GaussianBlur
default, used by the reference via cv::SIFT and cv::GaussianBlur).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np


def gaussian_kernel_1d(sigma: float, radius: int = None) -> np.ndarray:
    """OpenCV-compatible 1-D Gaussian (float path: radius = round(4*sigma))."""
    if radius is None:
        radius = max(1, int(round(sigma * 4)))
    x = np.arange(-radius, radius + 1, dtype=np.float64)
    k = np.exp(-(x ** 2) / (2.0 * sigma * sigma))
    k /= k.sum()
    return k.astype(np.float32)


def _reflect_pad_1d(img: jnp.ndarray, radius: int, axis: int) -> jnp.ndarray:
    pad = [(0, 0)] * img.ndim
    pad[axis] = (radius, radius)
    return jnp.pad(img, pad, mode="reflect")


def blur_2d(img: jnp.ndarray, sigma: float, radius: int = None) -> jnp.ndarray:
    """Separable Gaussian blur of a (H, W) image (or (..., H, W) batch)."""
    if sigma <= 0:
        return img
    k = gaussian_kernel_1d(sigma, radius)
    r = (len(k) - 1) // 2
    kj = jnp.asarray(k)

    orig_shape = img.shape
    x = img.reshape((-1,) + orig_shape[-2:])  # (B, H, W)
    B, H, W = x.shape

    # rows
    xp = _reflect_pad_1d(x, r, axis=1)
    xp = xp[:, :, None, :]  # (B, H+2r, 1, W) as NCHW with C=1? use NHWC
    # lax conv wants (N, C, H, W); treat W as batch-ish via transpose instead:
    # simpler: use conv with kernel (1, 1, k, 1) on (B, 1, H+2r, W)
    xp = xp.squeeze(2)[:, None, :, :]
    out = jax.lax.conv_general_dilated(
        xp, kj.reshape(1, 1, -1, 1), window_strides=(1, 1), padding="VALID")
    x = out[:, 0]

    # cols
    xp = _reflect_pad_1d(x, r, axis=2)[:, None, :, :]
    out = jax.lax.conv_general_dilated(
        xp, kj.reshape(1, 1, 1, -1), window_strides=(1, 1), padding="VALID")
    x = out[:, 0]
    return x.reshape(orig_shape)


def downsample_2x(img: jnp.ndarray) -> jnp.ndarray:
    """Nearest-neighbor 2x decimation (OpenCV SIFT inter-octave resize)."""
    return img[..., ::2, ::2]


def upsample_2x_linear(img: jnp.ndarray) -> jnp.ndarray:
    """Bilinear 2x upsample (OpenCV SIFT base-image doubling)."""
    h, w = img.shape[-2:]
    return jax.image.resize(img, img.shape[:-2] + (2 * h, 2 * w), "bilinear")
