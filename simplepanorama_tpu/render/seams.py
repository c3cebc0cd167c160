"""Seam finding: distance-transform seams (graph-cut lives in graphcut.py).

Reproduces dcut::dist_cut (/root/reference/src/math/_distance_cut.cpp:7-51):
for every overlapping pair a pixel stays with the image whose distance
transform is larger. The reference's sequential pairwise masking is
equivalent to one canvas-level rule — a pixel survives in mask i iff
dt_i >= max_j dt_j over all images covering it — which is how it's
computed here: one max-canvas accumulation plus one comparison per image
(O(N) instead of O(N^2) pair scans, and fully data-parallel).
"""

from __future__ import annotations

import functools
from typing import List, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from simplepanorama_tpu.ops.edt import distance_transform


@functools.partial(jax.jit, static_argnames=("canvas_hw",))
def _dist_cut_packed(msks, offs, canvas_hw):
    H, W = canvas_hw
    N, Hb, Wb = msks.shape
    dts = jax.vmap(lambda m: distance_transform(m > 0))(msks)
    dmax = jnp.zeros((H + Hb, W + Wb), jnp.float32)
    for i in range(N):
        sl = jax.lax.dynamic_slice(dmax, (offs[i, 0], offs[i, 1]), (Hb, Wb))
        dmax = jax.lax.dynamic_update_slice(
            dmax, jnp.maximum(sl, dts[i]), (offs[i, 0], offs[i, 1]))
    out = []
    for i in range(N):
        sl = jax.lax.dynamic_slice(dmax, (offs[i, 0], offs[i, 1]), (Hb, Wb))
        keep = (msks[i] > 0) & (dts[i] >= sl)
        out.append(keep)
    return jnp.stack(out)


def dist_cut(masks: Sequence[np.ndarray],
             corners: Sequence[Tuple[int, int]]) -> List[np.ndarray]:
    """Distance-transform seam masks (same shapes as the inputs)."""
    from simplepanorama_tpu.render.blending import pack_blocks
    dummy = [np.zeros(m.shape + (3,), np.float32) for m in masks]
    _, msks, offs, hw = pack_blocks(dummy, masks, corners)
    cut = np.asarray(_dist_cut_packed(msks, offs, hw))
    return [cut[i, :m.shape[0], :m.shape[1]] for i, m in enumerate(masks)]
