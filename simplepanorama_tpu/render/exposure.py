"""Exposure-disparity fix (the reference's "test" namespace —
test::equalizeIntensities / adjust_intensity, /root/reference/src/test/
_test.cpp:9-122; this is the README's exposure feature, not a test suite).

At half resolution: per-image gray intensity weighted by its distance
transform; each image accumulates its overlapping neighbors' weighted
intensities and weights (over ROI-rect overlaps, inside its own mask);
the correction field is own_intensity / (blended mean + eps) + eps, with
1.0 outside the mask, Gaussian-smoothed 13x13 sigma 7. Applied at blend
time by resizing to the image and dividing channel-wise.

The neighbor accumulation is the same canvas trick as seams.py: one
canvas sum of all weighted intensities / weights, then per-image slice —
O(N) instead of the reference's O(N^2) ROI pair loop.
"""

from __future__ import annotations

import functools
from typing import List, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from simplepanorama_tpu.ops.edt import distance_transform


def _resize_half(x: np.ndarray) -> np.ndarray:
    import cv2
    return cv2.resize(x.astype(np.float32), None, fx=0.5, fy=0.5,
                      interpolation=cv2.INTER_LINEAR)


@functools.partial(jax.jit, static_argnames=("canvas_hw",))
def _equalize_packed(grays, dts, msks, offs, canvas_hw):
    H, W = canvas_hw
    N, Hb, Wb = grays.shape
    eps = 1e-5
    int_dist = grays * dts
    cint = jnp.zeros((H + Hb, W + Wb), jnp.float32)
    cw = jnp.zeros((H + Hb, W + Wb), jnp.float32)
    for i in range(N):
        cint = cint.at[...].set(jax.lax.dynamic_update_slice(
            cint, jax.lax.dynamic_slice(
                cint, (offs[i, 0], offs[i, 1]), (Hb, Wb)) + int_dist[i],
            (offs[i, 0], offs[i, 1])))
        cw = cw.at[...].set(jax.lax.dynamic_update_slice(
            cw, jax.lax.dynamic_slice(
                cw, (offs[i, 0], offs[i, 1]), (Hb, Wb)) + dts[i],
            (offs[i, 0], offs[i, 1])))

    outs = []
    radius = 6  # 13x13 kernel
    t = np.arange(-radius, radius + 1, dtype=np.float64)
    k = np.exp(-(t * t) / (2.0 * 49.0))
    k = jnp.asarray((k / k.sum()).astype(np.float32))
    for i in range(N):
        acc_i = jax.lax.dynamic_slice(cint, (offs[i, 0], offs[i, 1]),
                                      (Hb, Wb))
        acc_w = jax.lax.dynamic_slice(cw, (offs[i, 0], offs[i, 1]),
                                      (Hb, Wb))
        m = msks[i] > 0
        blended = acc_i / (acc_w + eps) + eps
        corr = jnp.where(m, grays[i] / blended, 0.0) + (~m)
        # separable 13x13 blur, reflect-ish via edge clamp
        c = corr[None, None]
        c = jax.lax.conv_general_dilated(
            jnp.pad(c, ((0, 0), (0, 0), (0, 0), (radius, radius)),
                    mode="edge"),
            k[None, None, None, :], (1, 1), "VALID")
        c = jax.lax.conv_general_dilated(
            jnp.pad(c, ((0, 0), (0, 0), (radius, radius), (0, 0)),
                    mode="edge"),
            k[None, None, :, None], (1, 1), "VALID")
        outs.append(c[0, 0])
    return jnp.stack(outs)


def equalize_intensities(images: Sequence[np.ndarray],
                         masks: Sequence[np.ndarray],
                         corners: Sequence[Tuple[int, int]],
                         ratio: float = 0.5) -> List[np.ndarray]:
    """Correction fields at ``ratio`` scale (one per image)."""
    from simplepanorama_tpu.render.blending import pack_blocks
    import cv2
    n = len(images)
    # one batched EDT dispatch over common-padded masks
    Hb = max(m.shape[0] for m in masks)
    Wb = max(m.shape[1] for m in masks)
    mk_b = np.zeros((n, Hb, Wb), bool)
    for i, m in enumerate(masks):
        mk_b[i, :m.shape[0], :m.shape[1]] = np.asarray(m) > 0
    dt_b = np.asarray(jax.vmap(distance_transform)(jnp.asarray(mk_b))) / 255.0

    grays, msk_small, dts, corners_s = [], [], [], []
    for i, (im, mk, (tx, ty)) in enumerate(zip(images, masks, corners)):
        g = (0.114 * im[..., 0] + 0.587 * im[..., 1]
             + 0.299 * im[..., 2]) / 255.0
        gs = _resize_half(g)
        ms = _resize_half(np.asarray(mk, np.float32))
        dt = dt_b[i, :mk.shape[0], :mk.shape[1]]
        dts.append(_resize_half(dt))
        grays.append(np.where(ms > 0.5, gs, 0.0))
        msk_small.append(ms > 0.5)
        corners_s.append((int(tx * ratio), int(ty * ratio)))
    dummy = [np.zeros(g.shape + (3,), np.float32) for g in grays]
    _, msks, offs, hw = pack_blocks(dummy, msk_small, corners_s)
    N, Hb, Wb = msks.shape
    gp = np.zeros((n, Hb, Wb), np.float32)
    dp = np.zeros((n, Hb, Wb), np.float32)
    for i in range(n):
        h, w = grays[i].shape
        gp[i, :h, :w] = grays[i]
        dp[i, :h, :w] = dts[i]
    fields = np.asarray(_equalize_packed(
        jnp.asarray(gp), jnp.asarray(dp), msks, offs, hw))
    return [fields[i, :g.shape[0], :g.shape[1]]
            for i, g in enumerate(grays)]


def adjust_intensity(images: Sequence[np.ndarray],
                     fields: Sequence[np.ndarray]) -> List[np.ndarray]:
    """Divide each image by its (resized) correction field
    (test::adjust_intensity). Images float 0..255; output same scale."""
    import cv2
    out = []
    for im, f in zip(images, fields):
        fr = cv2.resize(f, (im.shape[1], im.shape[0]),
                        interpolation=cv2.INTER_LINEAR)
        fr = np.where(np.abs(fr) < 1e-6, 1.0, fr)
        out.append(im / fr[..., None])
    return out


def straighten(rotations: np.ndarray) -> np.ndarray:
    """Brown-Lowe auto-straightening (strg::straightenPanorama,
    /root/reference/src/math/_straightening.cpp:5-51): covariance of
    camera X axes, up-vector = smallest eigenvector sign-aligned to world
    up, global rotation aligning it to (0,1,0)."""
    X = rotations[:, :, 0]                     # camera X axes (N,3)
    C = X.T @ X
    wvals, wvecs = np.linalg.eigh(C)
    up = wvecs[:, 0]
    world_up = np.array([0.0, 1.0, 0.0])
    if up @ world_up < 0:
        up = -up
    w = np.cross(up, world_up)
    s = np.linalg.norm(w)
    c = up @ world_up
    if s < 1e-12:
        return rotations.copy()
    V = np.array([[0, -w[2], w[1]], [w[2], 0, -w[0]], [-w[1], w[0], 0]])
    g = np.eye(3) + V + V @ V * ((1 - c) / (s * s))
    return np.einsum("ab,nbc->nac", g, rotations)
