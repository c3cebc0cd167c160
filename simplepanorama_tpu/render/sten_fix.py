"""Stereographic missing-center fix.

Reproduces sten_proj::{estimate_circle, disk_reproj, inpaint}
(/root/reference/src/math/_projection.cpp:87-294, 327-419): find the
near-center hole of the little-planet projection (connected components of
the empty canvas region, min enclosing circle, cutoffs at .2/.5 of the
half-diagonal, radius + 3), then radially stretch everything outside the
hole with a linear or quadratic profile so the hole closes, and finally
Navier-Stokes-inpaint the residual central speck after blending.

The per-pixel radial remap runs on-device (one jitted backward-map kernel
per common padded ROI shape, bilinear sampling — the reference uses
INTER_CUBIC; the profile is smooth so the difference is sub-quantum);
hole analysis and the tiny inpaint stay host-side cv2 exactly like the
reference's OpenCV calls.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from simplepanorama_tpu.geometry.canvas import get_pan_dimension


def estimate_circle(masks, corners) -> Optional[Tuple[Tuple[int, int], float]]:
    """((cx, cy) in canvas coords, radius) of the central hole, or None
    (reference prints 'No midsection found' and skips)."""
    import cv2
    sizes = [m.shape[:2] for m in masks]
    d = get_pan_dimension(corners, sizes)
    canvas = np.zeros((d.height, d.width), np.uint8)
    for m, (tx, ty) in zip(masks, corners):
        h, w = m.shape[:2]
        y0, x0 = ty - d.min_y, tx - d.min_x
        region = canvas[y0:y0 + h, x0:x0 + w]
        region |= (np.asarray(m) > 0).astype(np.uint8) * 255
    hole = 255 - canvas
    if cv2.countNonZero(hole) == 0:
        return None
    ncomp, labels, stats, _ = cv2.connectedComponentsWithStats(hole)
    cx0, cy0 = d.width / 2.0, d.height / 2.0
    half_diag = np.sqrt(d.width ** 2 + d.height ** 2) / 2.0
    best = None
    best_dist = np.inf
    for i in range(1, ncomp):
        if stats[i, cv2.CC_STAT_AREA] < 100:
            continue
        # robustness deviation from the reference (analyzeComponentsWithCircles,
        # _util.cpp:8-81): skip components touching the canvas border — the
        # OUTER empty region always does, and its min-enclosing circle is
        # canvas-centered with radius ~half-diag, so on symmetric (e.g.
        # full-360) planets it wins the center-distance tie and the radius
        # cutoff then rejects the fix entirely. A genuine central hole is
        # enclosed by content and never reaches the border.
        x0b, y0b = stats[i, cv2.CC_STAT_LEFT], stats[i, cv2.CC_STAT_TOP]
        wb, hb = stats[i, cv2.CC_STAT_WIDTH], stats[i, cv2.CC_STAT_HEIGHT]
        if x0b == 0 or y0b == 0 or x0b + wb >= d.width \
                or y0b + hb >= d.height:
            continue
        comp = (labels == i).astype(np.uint8) * 255
        contours, _ = cv2.findContours(comp, cv2.RETR_EXTERNAL,
                                       cv2.CHAIN_APPROX_SIMPLE)
        if not contours:
            continue
        (x, y), r = cv2.minEnclosingCircle(contours[0])
        dist = np.hypot(x - cx0, y - cy0)
        if dist < best_dist:
            best_dist = dist
            best = ((x, y), r)
    if best is None or best_dist > half_diag * 0.2 or best[1] > half_diag * 0.5:
        return None
    (x, y), r = best
    return (int(x), int(y)), float(r + 3.0)


@functools.partial(jax.jit, static_argnames=("out_h", "out_w", "quadratic"))
def _radial_remap(img, src_mask, tr_origin, org_origin, center, scale,
                  radius, out_h: int, out_w: int, quadratic: bool,
                  valid_hw):
    """Backward radial stretch: dst pixel -> normalized polar -> profile
    r_src = r^q (2-R) + R (quadratic) or r (1-R) + R (linear) ->
    source pixel in the image's original bbox (disk_reproj inner loop,
    _projection.cpp:230-270)."""
    yy = jax.lax.broadcasted_iota(jnp.float32, (out_h, out_w), 0)
    xx = jax.lax.broadcasted_iota(jnp.float32, (out_h, out_w), 1)
    px = (xx + tr_origin[0] - center[0]) * scale
    py = (yy + tr_origin[1] - center[1]) * scale
    r = jnp.sqrt(px * px + py * py)
    phi = jnp.arctan2(py, px)
    if quadratic:
        r_src = r * r * (2.0 - radius) + radius
    else:
        r_src = r * (1.0 - radius) + radius
    sx = jnp.cos(phi) * r_src / scale + center[0] - org_origin[0]
    sy = jnp.sin(phi) * r_src / scale + center[1] - org_origin[1]

    h = valid_hw[0].astype(jnp.float32)
    w = valid_hw[1].astype(jnp.float32)
    inb = (sx >= 0) & (sx <= w - 1) & (sy >= 0) & (sy <= h - 1)
    H, W = img.shape[:2]
    x0 = jnp.clip(jnp.floor(sx), 0, W - 2).astype(jnp.int32)
    y0 = jnp.clip(jnp.floor(sy), 0, H - 2).astype(jnp.int32)
    fx = jnp.clip(sx - x0, 0.0, 1.0)[..., None]
    fy = jnp.clip(sy - y0, 0.0, 1.0)[..., None]
    out = ((img[y0, x0] * (1 - fx) + img[y0, x0 + 1] * fx) * (1 - fy)
           + (img[y0 + 1, x0] * (1 - fx) + img[y0 + 1, x0 + 1] * fx) * fy)
    m = ((src_mask[y0, x0] > 0) & (src_mask[y0 + 1, x0 + 1] > 0)
         & (src_mask[y0, x0 + 1] > 0) & (src_mask[y0 + 1, x0] > 0))
    m = m & inb
    return jnp.where(inb[..., None], out, 0.0), m


def _forward_profile(r, radius, quadratic):
    e = r * r if quadratic else r
    return np.where(e > radius, (e - radius) / (1.0 - radius), r)


def disk_reproj(imgs, masks, corners, center_xy, radius_px,
                quadratic: bool = True):
    """Apply the radial stretch to all warped images. Returns
    (imgs, masks, corners, ansatz_centered, radius_norm, norm) with
    corners re-centered like the reference (canvas center at origin)."""
    from simplepanorama_tpu.render.projection import erode_mask
    sizes = [im.shape[:2] for im in imgs]
    d = get_pan_dimension(corners, sizes)
    half = (d.width // 2 + 1, d.height // 2 + 1)
    ansatz = (center_xy[0] - half[0], center_xy[1] - half[1])
    new_corners = [(tx - d.min_x - half[0], ty - d.min_y - half[1])
                   for tx, ty in corners]
    pts = []
    for (tx, ty), (h, w) in zip(new_corners, sizes):
        pts += [(tx, ty), (tx + w, ty), (tx + w, ty + h), (tx, ty + h)]
    dists = [np.hypot(px - ansatz[0], py - ansatz[1]) for px, py in pts]
    scale = 1.0 / max(1e-6, max(dists))
    radius_n = radius_px * scale

    # transformed bounding boxes via forward-mapped borders
    tr_boxes = []
    for (tx, ty), (h, w) in zip(new_corners, sizes):
        bx = np.linspace(tx, tx + w, 256)
        by = np.linspace(ty, ty + h, 256)
        border = np.concatenate([
            np.stack([bx, np.full_like(bx, ty)], 1),
            np.stack([bx, np.full_like(bx, ty + h)], 1),
            np.stack([np.full_like(by, tx), by], 1),
            np.stack([np.full_like(by, tx + w), by], 1)])
        nx = (border[:, 0] - ansatz[0]) * scale
        ny = (border[:, 1] - ansatz[1]) * scale
        r = np.hypot(nx, ny)
        phi = np.arctan2(ny, nx)
        r2 = _forward_profile(r, radius_n, quadratic)
        ux = np.cos(phi) * r2 / scale + ansatz[0]
        uy = np.sin(phi) * r2 / scale + ansatz[1]
        tr_boxes.append((int(np.floor(ux.min())), int(np.floor(uy.min())),
                         int(np.ceil(ux.max() - ux.min())) + 1,
                         int(np.ceil(uy.max() - uy.min())) + 1))

    out_h = max(b[3] for b in tr_boxes)
    out_w = max(b[2] for b in tr_boxes)
    out_h = (out_h + 7) // 8 * 8
    out_w = (out_w + 127) // 128 * 128
    Hs = max(s[0] for s in sizes)
    Ws = max(s[1] for s in sizes)

    new_imgs, new_masks, out_corners = [], [], []
    for im, mk, (tx, ty), (bx, by, bw, bh) in zip(imgs, masks, new_corners,
                                                  tr_boxes):
        h, w = im.shape[:2]
        imp = np.zeros((Hs, Ws, 3), np.float32)
        imp[:h, :w] = im
        mkp = np.zeros((Hs, Ws), np.float32)
        mkp[:h, :w] = np.asarray(mk, np.float32)
        warped, mask = _radial_remap(
            jnp.asarray(imp), jnp.asarray(mkp),
            jnp.asarray(np.array([bx, by], np.float32)),
            jnp.asarray(np.array([tx, ty], np.float32)),
            jnp.asarray(np.array(ansatz, np.float32)),
            float(scale), float(radius_n), out_h, out_w, bool(quadratic),
            jnp.asarray(np.array([h, w], np.int32)))
        mask = erode_mask(mask, iters=4)
        new_imgs.append(np.asarray(warped)[:bh, :bw])
        new_masks.append(np.asarray(mask)[:bh, :bw])
        out_corners.append((bx, by))
    return new_imgs, new_masks, out_corners, ansatz


def inpaint_center(img: np.ndarray, ansatz_canvas, radius) -> np.ndarray:
    """Navier-Stokes inpaint of the residual central speck
    (sten_proj::inpaint, _projection.cpp:327-358)."""
    import cv2
    h, w = img.shape[:2]
    x0 = int(ansatz_canvas[0] - w // 8)
    y0 = int(ansatz_canvas[1] - h // 8)
    x0 = max(0, min(w - w // 4 - 1, x0))
    y0 = max(0, min(h - h // 4 - 1, y0))
    roi = img[y0:y0 + h // 4, x0:x0 + w // 4]
    gray = (0.114 * roi[..., 0] + 0.587 * roi[..., 1]
            + 0.299 * roi[..., 2]).astype(np.uint8)
    roi_mask = (gray <= 1).astype(np.uint8) * 255
    mask = np.zeros((h, w), np.uint8)
    mask[y0:y0 + h // 4, x0:x0 + w // 4] = roi_mask
    return cv2.inpaint(img.astype(np.uint8), mask, 3, cv2.INPAINT_NS)


def apply_center_fix(params, cfg) -> None:
    """estimate_circle + disk_reproj; stores the inpaint anchor for the
    blend stage (set_config, _panorama.cpp:103-124). Host detour: the
    packed device state is materialized, fixed, and repacked."""
    from simplepanorama_tpu.config import Stretch
    imgs_l, masks_l, corners_l = params._lists()
    est = estimate_circle(masks_l, corners_l)
    if est is None:
        params.sten_circle = None
        return
    (cx, cy), r = est
    quad = cfg.stretching == Stretch.QUADRATIC_SCALING
    imgs, masks, corners, ansatz = disk_reproj(
        imgs_l, masks_l, corners_l, (cx, cy), r, quad)
    from simplepanorama_tpu.stitcher import _pack_state
    params.state = _pack_state(imgs, masks, corners)
    params.sten_circle = (ansatz, r)
