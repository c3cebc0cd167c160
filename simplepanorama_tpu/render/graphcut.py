"""Graph-cut seam finding (Kwatra et al., Graphcut Textures).

Reproduces gcut::graph_cut (/root/reference/src/math/_graph_cut.cpp):
incremental compositing in BA insertion order — paste the first image;
for each next image, cut the overlap between the existing panorama
(grayscale) and the new image; finally a mutual-exclusion pass makes
later masks carve earlier ones (:84-115, equivalent to ownership by the
latest covering image).

Per-pair cut (computeCut, :285-341 + graph helper):
  nodes    = overlap pixels (scene mask ∧ element mask);
  edges    = 4-neighborhood, capacity between neighbors p, q:
             (|I1-I2|(p) + |I1-I2|(q)) / (sum of |Scharr| grads + eps) —
             horizontal edges use y-gradients, vertical use x-gradients
             (scharr_gradient::read, :248-282);
  t-links  = weight 5000 on the scene-mask contour (source) and the
             element-mask contour (sink), contours restricted to the
             overlap (graph_object ctor, _graph_cut_helper.h:28-80;
             define_graph_full, :344-405);
  result   = element mask with overlap pixels set to 255 * (source side).

The BK max-flow is replaced by the data-parallel push-relabel kernel
(ops/maxflow.grid_mincut), which converges to a min cut of the same
graph.
"""

from __future__ import annotations

import functools
from typing import Callable, List, Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from simplepanorama_tpu.ops.maxflow import grid_mincut, grid_mincut_auto
from simplepanorama_tpu.geometry.canvas import get_pan_dimension

_SEED_W = 5000.0
_EPS = 1e-6


def _scharr(img: jnp.ndarray):
    """OpenCV Scharr 3x3 gradients (x, y) of a (H, W) float image."""
    kx = jnp.asarray(np.array([[-3, 0, 3], [-10, 0, 10], [-3, 0, 3]],
                              np.float32))
    ky = kx.T
    x = img[None, None]
    pad = [(1, 1), (1, 1)]
    gx = jax.lax.conv_general_dilated(x, kx[None, None], (1, 1), pad)[0, 0]
    gy = jax.lax.conv_general_dilated(x, ky[None, None], (1, 1), pad)[0, 0]
    return gx, gy


def _boundary(mask: jnp.ndarray) -> jnp.ndarray:
    """Mask boundary (findContours/drawContours thickness-1 equivalent):
    foreground pixels with a background 4-neighbor or at the border."""
    m = mask.astype(jnp.float32)
    mn = -jax.lax.reduce_window(-m, -1.0, jax.lax.max, (3, 3), (1, 1),
                                "SAME")
    mn = mn.at[0, :].set(0.0).at[-1, :].set(0.0)
    mn = mn.at[:, 0].set(0.0).at[:, -1].set(0.0)
    return (m > 0) & (mn <= 0)


@functools.partial(jax.jit, static_argnames=())
def _build_cut_graph(img1: jnp.ndarray, img2: jnp.ndarray,
                     mask1: jnp.ndarray, mask2: jnp.ndarray):
    """Edge weights + seeds of one seam cut; inputs (H, W), 0..255
    scale. Returns (cap_h, cap_v, excess, node)."""
    obj = (mask1 > 0) & (mask2 > 0)
    A = jnp.abs(img1 - img2)
    g1x, g1y = _scharr(img1)
    g2x, g2y = _scharr(img2)

    def nb(x, dy, dx):
        return jnp.roll(x, (-dy, -dx), axis=(0, 1))

    # horizontal edge (y,x)-(y,x+1): uses y-gradients
    wh = (A + nb(A, 0, 1)) / (jnp.abs(g1y) + nb(jnp.abs(g1y), 0, 1)
                              + jnp.abs(g2y) + nb(jnp.abs(g2y), 0, 1) + _EPS)
    # vertical edge (y,x)-(y+1,x): uses x-gradients
    wv = (A + nb(A, 1, 0)) / (jnp.abs(g1x) + nb(jnp.abs(g1x), 1, 0)
                              + jnp.abs(g2x) + nb(jnp.abs(g2x), 1, 0) + _EPS)

    cont_scene = _boundary(mask1) & obj
    cont_elem = _boundary(mask2) & obj
    excess = _SEED_W * cont_scene.astype(jnp.float32) \
        - _SEED_W * (cont_elem & ~cont_scene).astype(jnp.float32)
    return wh, wv, excess, obj


def _solve_cut(wh, wv, excess, obj, mask2):
    """Min-cut dispatch: data-parallel push-relabel on an accelerator
    (column-sharded over the mesh when >1 device is attached), the native
    Dinic backend on host CPU (the reference's BK slot)."""
    import jax as _jax
    from simplepanorama_tpu.parallel.mesh import pipeline_mesh
    mesh = pipeline_mesh()
    if _jax.default_backend() == "cpu":
        from simplepanorama_tpu.native import grid_mincut_native
        try:
            side, _ = grid_mincut_native(
                np.asarray(wh), np.asarray(wv), np.asarray(excess),
                np.asarray(obj))
            side = jnp.asarray(side)
        except Exception:
            side = grid_mincut(wh, wv, excess, obj)
    elif mesh is not None:
        from simplepanorama_tpu.parallel.dist_mincut import \
            grid_mincut_sharded
        side = grid_mincut_sharded(wh, wv, excess, obj, mesh)
    else:
        # single accelerator: whole-solver Pallas kernel when the state
        # fits VMEM, XLA while_loop otherwise
        side = grid_mincut_auto(wh, wv, excess, obj)
    return jnp.where(obj, side, mask2 > 0)


def graph_cut(images: Sequence[np.ndarray],
              masks: Sequence[np.ndarray],
              corners: Sequence[Tuple[int, int]],
              seq: Sequence[int],
              progress: Optional[Callable[[float], None]] = None,
              cancelled: Optional[Callable[[], bool]] = None,
              ) -> List[np.ndarray]:
    """Incremental graph-cut seams over the component's images.

    ``seq`` is the BA insertion order (local indices). Returns one seam
    mask per image (same order/shapes as ``masks``).
    """
    sizes = [im.shape[:2] for im in images]
    d = get_pan_dimension(corners, sizes)
    H, W = d.height, d.width
    pano = np.zeros((H, W), np.float32)         # grayscale canvas
    scene = np.zeros((H, W), bool)
    rois = []
    grays = []
    for im, (tx, ty) in zip(images, corners):
        g = 0.114 * im[..., 0] + 0.587 * im[..., 1] + 0.299 * im[..., 2]
        grays.append(np.asarray(g, np.float32))
        rois.append((ty - d.min_y, tx - d.min_x))

    out = [np.asarray(m) > 0 for m in masks]
    first = seq[0]
    y0, x0 = rois[first]
    h, w = sizes[first]
    m0 = out[first]
    pano[y0:y0 + h, x0:x0 + w][m0] = grays[first][m0]
    scene[y0:y0 + h, x0:x0 + w] |= m0

    n = max(1, len(seq) - 1)
    for s in seq[1:]:
        if cancelled is not None and cancelled():
            raise RuntimeError("Process canceled")
        y0, x0 = rois[s]
        h, w = sizes[s]
        pano_roi = pano[y0:y0 + h, x0:x0 + w]
        scene_roi = scene[y0:y0 + h, x0:x0 + w]
        m2 = jnp.asarray(out[s].astype(np.float32) * 255)
        graph = _build_cut_graph(
            jnp.asarray(pano_roi), jnp.asarray(grays[s]),
            jnp.asarray(scene_roi.astype(np.float32) * 255), m2)
        cut = np.asarray(_solve_cut(*graph, m2))
        out[s] = cut
        pano_roi[cut] = grays[s][cut]
        scene_roi |= cut
        if progress is not None:
            progress(1.0 / n)

    # mutual exclusion: ownership by the latest covering image in seq
    owner = -np.ones((H, W), np.int32)
    for rank, s in enumerate(seq):
        y0, x0 = rois[s]
        h, w = sizes[s]
        region = owner[y0:y0 + h, x0:x0 + w]
        region[out[s]] = s
    for s in seq:
        y0, x0 = rois[s]
        h, w = sizes[s]
        out[s] = out[s] & (owner[y0:y0 + h, x0:x0 + w] == s)
    return [o for o in out]
