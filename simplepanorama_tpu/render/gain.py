"""Gain compensation (Brown & Lowe §6, eq. 29).

Reproduces gain::gain_compensation (/root/reference/src/math/
_gain_compensation.cpp): for every overlapping pair (by warped-ROI rect,
over adj + I), the overlap area N_ij and mean gray intensity I_ij over the
joint mask; then the normal equations M g = G with sigma_N = 100,
sigma_g = .01 and a tiny host solve. Gains divide the images
(img / g_i, _panorama.cpp:176).

Pairwise overlap sums are computed on-device in one shot: each image's
gray*mask and mask are placed on a shared canvas layer stack, pair sums
are canvas dot products — batched, no host pair loop over pixels.
"""

from __future__ import annotations

import functools
from typing import List, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp


def _gray(img: np.ndarray) -> np.ndarray:
    """BGR float (0..255) -> gray uint8-style weights (OpenCV)."""
    return (0.114 * img[..., 0] + 0.587 * img[..., 1]
            + 0.299 * img[..., 2])


@functools.partial(jax.jit, static_argnames=("canvas_hw",))
def _overlap_sums(grays, msks, offs, canvas_hw):
    """For all pairs: (area N_ij, sum_i, sum_j over joint mask).

    Returns (N (n,n), S (n,n)) where S[i,j] = sum of image i's gray over
    the i&j overlap (so I_ij of the reference = S[j,i]/N as it stores
    I_j/area at [i][j] — handled by the caller)."""
    H, W = canvas_hw
    n, Hb, Wb = grays.shape
    # place each image's mask and masked gray on its canvas position once
    cm = jnp.zeros((n, H + Hb, W + Wb), jnp.float32)
    cg = jnp.zeros((n, H + Hb, W + Wb), jnp.float32)
    for i in range(n):
        cm = cm.at[i].set(jax.lax.dynamic_update_slice(
            cm[i], (msks[i] > 0).astype(jnp.float32),
            (offs[i, 0], offs[i, 1])))
        cg = cg.at[i].set(jax.lax.dynamic_update_slice(
            cg[i], grays[i] * (msks[i] > 0), (offs[i, 0], offs[i, 1])))
    flat_m = cm.reshape(n, -1)
    flat_g = cg.reshape(n, -1)
    N = flat_m @ flat_m.T                      # joint areas
    S = flat_g @ flat_m.T                      # sum of gray_i over i&j
    return N, S


def gain_compensation(images: Sequence[np.ndarray],
                      masks: Sequence[np.ndarray],
                      corners: Sequence[Tuple[int, int]],
                      adj: np.ndarray) -> np.ndarray:
    """Per-image gains g (apply as img / g)."""
    from simplepanorama_tpu.render.blending import pack_blocks
    n = len(images)
    grays = [_gray(np.asarray(im, np.float32)) for im in images]
    dummy = [np.zeros(g.shape + (3,), np.float32) for g in grays]
    _, msks, offs, hw = pack_blocks(dummy, masks, corners)
    gp = np.zeros_like(np.asarray(msks))
    for i, g in enumerate(grays):
        gp[i, :g.shape[0], :g.shape[1]] = g
    N, S = _overlap_sums(jnp.asarray(gp), msks, offs, hw)
    N = np.asarray(N, np.float64)
    S = np.asarray(S, np.float64)

    adj_sym = np.asarray(adj) + np.asarray(adj).T + np.eye(n)
    use = adj_sym > 0
    N = np.where(use & (N > 0), N, 0.0)
    with np.errstate(divide="ignore", invalid="ignore"):
        I = np.where(N > 0, S / N, 0.0)   # I[i,j] = mean of image i on i&j

    # the reference's I_ij[i][j] is the mean of image *j* over the overlap
    # (get_overlapp_intensity stores I_j/area at [i][j]) = our I.T
    Iref = I.T
    S_N, S_g = 100.0, 0.01
    B = np.diag(N.sum(axis=1))
    A = np.diag((N * Iref * Iref).sum(axis=1))
    C = N * Iref * Iref.T
    G = (1.0 / S_g) * np.diag(B)
    M = (2.0 / S_N) * (A - C) + (1.0 / S_g) * B
    try:
        g = np.linalg.solve(M, G)
    except np.linalg.LinAlgError:
        g = np.ones(n)
    return g
