"""Spatially-sharded compositing: the panorama canvas partitioned across
devices.

This is the workload's analog of sequence parallelism (SURVEY §2.7/§5):
the reference composites sequentially on one CPU (blnd::multi_blend,
/root/reference/src/math/_blending.cpp:186-252; proj::get_proj_parameters,
/root/reference/src/math/_projection.cpp:422-454); here the two heavy
compositing stages get mesh-parallel schedules:

* ``multi_blend_sharded`` — the band-pass pyramid work (per-image, per-band
  Gaussian blurs: the FLOP-heavy part) is data-parallel over the image
  batch; each device accumulates its images' color/alpha contributions on a
  full canvas, then ONE ``psum_scatter`` per accumulator reduces across
  devices and leaves each device holding the summed slab of canvas columns.
  Normalization (color/alpha) is local to the slab; an ``all_gather``
  reassembles the panorama. Multiband blending is a pure sum over images,
  so the schedule is exact — NO_BLEND/SIMPLE_BLEND are order-dependent
  compositing and stay single-device.

* ``warp_tiled`` — the full-resolution render path. The reference's canvas
  can reach 30000 px (_img_manipulation.cpp:349-354); at full resolution
  the canvas, not the per-image blocks, is the memory high-water mark.
  Each device backward-maps ONLY its slab of canvas columns (inverse
  warping is embarrassingly parallel over destination pixels), so canvas
  memory scales 1/n_devices with zero communication.

* ``halo_exchange`` — ppermute neighbor-column exchange for canvas-resident
  stencils (boundary columns for blurs/erosions on column-sharded slabs).
"""

from __future__ import annotations

import functools
from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from simplepanorama_tpu.render.blending import _blur_fixed, _acc_add
from simplepanorama_tpu.render import projection as prj


def halo_exchange(x: jnp.ndarray, halo: int, axis: str,
                  fill: float = 0.0) -> jnp.ndarray:
    """Pad a column-sharded slab with ``halo`` columns from each mesh
    neighbor (``fill`` at the mesh ends). Must run inside shard_map over
    ``axis``; x is the local (H, Ws, ...) slab, returns (H, Ws+2*halo, ...).

    The ppermute pair is the TPU idiom for stencil boundaries: each device
    sends its edge columns one hop left and one hop right over ICI.
    """
    n = jax.lax.axis_size(axis)
    left_edge = jax.lax.slice_in_dim(x, 0, halo, axis=1)
    right_edge = jax.lax.slice_in_dim(x, x.shape[1] - halo, x.shape[1],
                                      axis=1)
    # device d receives (d-1)'s right edge as its left halo and (d+1)'s
    # left edge as its right halo (non-participants receive zeros)
    from_left = jax.lax.ppermute(
        right_edge, axis, [(d, d + 1) for d in range(n - 1)])
    from_right = jax.lax.ppermute(
        left_edge, axis, [(d + 1, d) for d in range(n - 1)])
    if fill != 0.0:
        d = jax.lax.axis_index(axis)
        from_left = jnp.where(d == 0, jnp.full_like(from_left, fill),
                              from_left)
        from_right = jnp.where(d == n - 1, jnp.full_like(from_right, fill),
                               from_right)
    return jnp.concatenate([from_left, x, from_right], axis=1)


# ---------------------------------------------------------------------------
# multiband blend: images-DP + canvas reduce_scatter
# ---------------------------------------------------------------------------

def _mb_block_contribution(img, seam, orig, bands: int, sigma: float):
    """Per-image multiband contribution summed over bands (same math as
    blending.multi_blend, which accumulates band-by-band — addition
    commutes): returns (color (Hb,Wb,3), alpha (Hb,Wb))."""
    radius = int(np.ceil(3 * sigma))
    color = jnp.zeros_like(img)
    alpha = jnp.zeros(img.shape[:2], jnp.float32)
    for i in range(bands):
        sigma_band = float(np.sqrt(2 * (bands - i) + 1) * sigma)
        blurred = _blur_fixed(img, sigma_band, radius)
        w = _blur_fixed((seam[..., None] > 0).astype(jnp.float32),
                        sigma_band, radius)[..., 0]
        if i == bands - 1:
            band = img - blurred
        elif i > 0:
            sigma_prev = float(np.sqrt(2 * (bands - i - 1) + 1) * sigma)
            band = blurred - _blur_fixed(img, sigma_prev, radius)
        else:
            band = blurred
        w = jnp.where(orig > 0, w, 0.0)
        color = color + band * w[..., None]
        alpha = alpha + w
    return color, alpha


def multi_blend_sharded(imgs, seam_msks, orig_msks, offs,
                        canvas_hw: Tuple[int, int], mesh: Mesh,
                        bands: int = 2, sigma: float = 7.0,
                        axis: str = "data") -> jnp.ndarray:
    """blending.multi_blend with the image batch sharded over ``mesh``.

    Collective schedule: local band-pyramid + local canvas accumulation,
    one psum_scatter per accumulator (color, alpha) that both reduces
    across devices and shards the result by canvas columns, local
    normalization. Returns the (H, W, 3) panorama (column-sharded global
    array; gathers lazily on host read).
    """
    from jax import shard_map

    H, W = canvas_hw
    N, Hb, Wb, _ = imgs.shape
    ndev = mesh.devices.size
    # pad the image batch to a multiple of the mesh size (zero masks
    # contribute nothing) and the canvas width so slabs divide evenly
    Np = (N + ndev - 1) // ndev * ndev
    if Np != N:
        pad = ((0, Np - N),)
        imgs = jnp.pad(imgs, pad + ((0, 0),) * 3)
        seam_msks = jnp.pad(seam_msks, pad + ((0, 0),) * 2)
        orig_msks = jnp.pad(orig_msks, pad + ((0, 0),) * 2)
        offs = jnp.pad(offs, pad + ((0, 0),))
    Hc = H + Hb
    Wc = ((W + Wb + ndev - 1) // ndev) * ndev

    def body(imgs_l, seams_l, origs_l, offs_l):
        color = jnp.zeros((Hc, Wc, 3), jnp.float32)
        alpha = jnp.zeros((Hc, Wc), jnp.float32)
        for j in range(imgs_l.shape[0]):
            c, a = _mb_block_contribution(imgs_l[j], seams_l[j],
                                          origs_l[j], bands, float(sigma))
            color = _acc_add(color, c, offs_l[j])
            alpha = _acc_add(alpha, a, offs_l[j])
        color = jax.lax.psum_scatter(color, axis, scatter_dimension=1,
                                     tiled=True)
        alpha = jax.lax.psum_scatter(alpha, axis, scatter_dimension=1,
                                     tiled=True)
        out = color / jnp.maximum(alpha[..., None], 1e-12)
        return jnp.where(alpha[..., None] > 0, out * bands, 0.0)

    # the normalized slab stays column-sharded; jit assembles the global
    # canvas (the all_gather happens lazily only if a consumer needs it)
    f = shard_map(body, mesh=mesh,
                  in_specs=(P(axis), P(axis), P(axis), P(axis)),
                  out_specs=P(None, axis))
    out = jax.jit(f)(imgs.astype(jnp.float32),
                     seam_msks.astype(jnp.float32),
                     orig_msks.astype(jnp.float32), offs)
    return out[:H, :W]


# ---------------------------------------------------------------------------
# tiled backward warp: canvas columns sharded
# ---------------------------------------------------------------------------

def warp_tiled(img, K_adj, R, corner, scale, kind: str,
               out_h: int, out_w: int, valid_hw, mesh: Mesh,
               axis: str = "data"):
    """projection.warp_backward with the destination ROI column-sharded:
    device d computes canvas columns [d*Ws, (d+1)*Ws). The source image is
    replicated; there is no communication. Returns (warped, mask) sharded
    (H, W/n) per device, assembled as global arrays by jit."""
    from jax import shard_map

    ndev = mesh.devices.size
    Wp = (out_w + ndev - 1) // ndev * ndev
    Ws = Wp // ndev

    def body(img_r, Ka_r, R_r, corner_r, vhw_r):
        d = jax.lax.axis_index(axis)
        yy = jax.lax.broadcasted_iota(jnp.float32, (out_h, Ws), 0)
        xx = (jax.lax.broadcasted_iota(jnp.float32, (out_h, Ws), 1)
              + (d * Ws).astype(jnp.float32))
        return prj.warp_from_grid(img_r, Ka_r, R_r, corner_r, scale, kind,
                                  yy, xx, vhw_r)

    f = shard_map(body, mesh=mesh,
                  in_specs=(P(), P(), P(), P(), P()),
                  out_specs=(P(None, axis), P(None, axis)))
    warped, mask = jax.jit(f)(img, K_adj, R, corner, valid_hw)
    return warped[:, :out_w], mask[:, :out_w]
