"""Column-sharded grid min-cut: push-relabel over a device mesh.

The reference's seam finder is the sequential Boykov-Kolmogorov max-flow
(/root/reference/src/max_flow/maxflow.cpp:472) and its README notes graph-
cut "can be very slow". ops.maxflow already replaces it with lock-step
push-relabel (every phase is an elementwise 4-neighbor stencil); this
module runs the SAME solver core with the grid's columns sharded across
the mesh: every neighbor access at a slab boundary becomes a 1-column
``ppermute`` halo exchange and every loop predicate a ``psum`` — the
canonical halo-stencil pattern (SURVEY §2.7: seam tiles sharded by
panorama region).

Numerics are identical to ops.maxflow.grid_mincut (same phase schedule,
same arithmetic), so the two return the same cut bit-for-bit.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from simplepanorama_tpu.ops import maxflow as mf
from simplepanorama_tpu.parallel.tiled_compose import halo_exchange


def _make_shift_sharded(axis: str):
    """A drop-in for maxflow._shift on column-sharded slabs: row shifts
    are local; column shifts exchange one halo column with the mesh
    neighbor."""

    def shift(x, dy, dx, fill):
        W = x.shape[1]
        if dx != 0:
            xp = halo_exchange(x, 1, axis, fill=float(fill))
            x = jax.lax.slice_in_dim(xp, 1 + dx, 1 + dx + W, axis=1)
        if dy == 1:
            x = jnp.roll(x, -1, axis=0).at[-1, :].set(fill)
        elif dy == -1:
            x = jnp.roll(x, 1, axis=0).at[0, :].set(fill)
        return x

    return shift


def grid_mincut_sharded(cap_h, cap_v, excess0, node, mesh: Mesh,
                        axis: str = "data", max_outer: int = 400,
                        inner_iters: int = 30, sweep_iters: int = 0):
    """ops.maxflow.grid_mincut with the (H, W) grid column-sharded over
    ``mesh``. Same arguments and result; W is padded to a mesh multiple
    internally (padding nodes are masked out)."""
    H, W = cap_h.shape
    ndev = mesh.devices.size
    Wp = (W + ndev - 1) // ndev * ndev
    if sweep_iters <= 0:
        sweep_iters = H + Wp + 4
    if Wp != W:
        pw = ((0, 0), (0, Wp - W))
        cap_h = jnp.pad(cap_h, pw)
        cap_v = jnp.pad(cap_v, pw)
        excess0 = jnp.pad(excess0, pw)
        node = jnp.pad(node, pw)

    shift = _make_shift_sharded(axis)

    def gany(b):
        return jax.lax.psum(b.astype(jnp.int32), axis) > 0

    def body(ch, cv, e0, nd):
        return mf._mincut_core(ch, cv, e0, nd, max_outer, inner_iters,
                               sweep_iters, shift=shift, gany=gany)

    f = shard_map(body, mesh=mesh,
                  in_specs=(P(None, axis),) * 4,
                  out_specs=P(None, axis))
    out = jax.jit(f)(cap_h.astype(jnp.float32), cap_v.astype(jnp.float32),
                     excess0.astype(jnp.float32), node.astype(bool))
    return out[:, :W]
