"""SIFT on TPU: DoG scale-space detector + descriptor as a fixed-shape JAX
program.

The reference delegates to OpenCV's SIFT and post-processes to rootSIFT with
center-origin keypoints (util::extract_keypoints,
/root/reference/src/math/_homography.cpp:727-751). Here the whole detector
runs on-device, redesigned for TPU execution rather than translated:

  * the Gaussian pyramid is built with separable depthwise convolutions
    (static kernel sizes — sigmas are trace-time constants);
  * scale-space extrema are found with 3x3x3 ``reduce_window`` max/min over
    the DoG stack — no per-pixel scalar loop;
  * a fixed per-octave budget of candidates is selected with ``top_k`` on
    the pre-threshold response map (fixed shapes; invalid slots masked);
  * sub-pixel refinement solves the 3x3 quadratic fit in closed form,
    vmapped over candidates (mirrors OpenCV's adjustLocalExtrema math);
  * orientation and descriptor use a *canonical resampling grid*: instead of
    OpenCV's variable-radius pixel loops, a fixed SxS grid in the keypoint
    frame is bilinearly sampled from the octave image, and the 4x4x8
    histogram is accumulated with one einsum (static trilinear spatial
    weights x data-dependent orientation weights) — MXU-friendly;
  * descriptors are rootSIFT-normalized (L1 + sqrt, convert_to_rootsift,
    _homography.cpp:700-724), so matching distances reduce to dot products.

Everything is jit/vmap-compatible: one compiled program serves a whole batch
of images padded to a common shape, with per-image valid extents as data.
"""

from __future__ import annotations

import functools
import math
from typing import List, NamedTuple, Tuple

import numpy as np
import jax
import jax.numpy as jnp

# OpenCV-compatible constants
_IMG_BORDER = 5          # SIFT_IMG_BORDER
_MAX_INTERP_STEPS = 5    # SIFT_MAX_INTERP_STEPS
_ORI_SIG_FCTR = 1.5      # SIFT_ORI_SIG_FCTR
_ORI_RADIUS = 3 * _ORI_SIG_FCTR  # 4.5
_ORI_HIST_BINS = 36
_DESCR_WIDTH = 4         # SIFT_DESCR_WIDTH (d)
_DESCR_HIST_BINS = 8     # SIFT_DESCR_HIST_BINS (n)
_DESCR_SCL_FCTR = 3.0    # SIFT_DESCR_SCL_FCTR
_DESCR_MAG_THR = 0.2     # SIFT_DESCR_MAG_THR
_ORI_GRID = 17           # canonical orientation sampling grid (odd)
_DESCR_GRID = 16         # canonical descriptor sampling grid


class SiftFeatures(NamedTuple):
    """Fixed-capacity keypoints+descriptors for one image (or a batch)."""
    xy: jnp.ndarray        # (..., K, 2) float32, original-image pixel coords
    size: jnp.ndarray      # (..., K) float32 keypoint diameter
    response: jnp.ndarray  # (..., K) float32
    desc: jnp.ndarray      # (..., K, 128) float32 rootSIFT (unit L2)
    valid: jnp.ndarray     # (..., K) bool


# ---------------------------------------------------------------------------
# Gaussian pyramid
# ---------------------------------------------------------------------------

def _gauss_kernel(sigma: float) -> np.ndarray:
    """1-D Gaussian taps, OpenCV float-image rule: 4 sigma each side."""
    radius = max(1, int(round(sigma * 4)))
    x = np.arange(-radius, radius + 1, dtype=np.float64)
    k = np.exp(-(x * x) / (2.0 * sigma * sigma))
    return (k / k.sum()).astype(np.float32)


def _blur(img: jnp.ndarray, sigma: float) -> jnp.ndarray:
    """Separable Gaussian blur of a (H, W) image, replicate borders."""
    if sigma <= 0:
        return img
    k = _gauss_kernel(sigma)
    r = (len(k) - 1) // 2
    x = img[None, None]                                   # (1,1,H,W)
    kh = jnp.asarray(k)[None, None, None, :]              # (1,1,1,T)
    kv = jnp.asarray(k)[None, None, :, None]              # (1,1,T,1)
    x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (r, r)), mode="edge")
    x = jax.lax.conv_general_dilated(x, kh, (1, 1), "VALID")
    x = jnp.pad(x, ((0, 0), (0, 0), (r, r), (0, 0)), mode="edge")
    x = jax.lax.conv_general_dilated(x, kv, (1, 1), "VALID")
    return x[0, 0]


def _pyramid_sigmas(sigma: float, n_layers: int) -> List[float]:
    """Incremental blur amounts between adjacent gaussian levels
    (OpenCV buildGaussianPyramid)."""
    k = 2.0 ** (1.0 / n_layers)
    sigs = [sigma]
    for i in range(1, n_layers + 3):
        sig_prev = (k ** (i - 1)) * sigma
        sig_total = sig_prev * k
        sigs.append(math.sqrt(sig_total ** 2 - sig_prev ** 2))
    return sigs


def build_pyramid(base: jnp.ndarray, sigma: float, n_layers: int,
                  n_octaves: int) -> List[jnp.ndarray]:
    """Gaussian pyramid: list over octaves of (n_layers+3, H_o, W_o)."""
    sigs = _pyramid_sigmas(sigma, n_layers)
    octaves = []
    cur = base
    for o in range(n_octaves):
        levels = [cur]
        for s in range(1, n_layers + 3):
            levels.append(_blur(levels[-1], sigs[s]))
        octaves.append(jnp.stack(levels))
        # next octave base: level n_layers, stride-2 subsample
        cur = levels[n_layers][::2, ::2]
    return octaves


# ---------------------------------------------------------------------------
# Extrema detection + refinement (per octave)
# ---------------------------------------------------------------------------

def _find_candidates(dog: jnp.ndarray, prethresh: float,
                     budget: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Top-``budget`` scale-space extrema of one octave's DoG stack.

    dog: (L+1, H, W) where extrema layers are 1..L-1.
    Returns (flat_idx (budget,), score (budget,)); score <= 0 marks empty.
    """
    ext = jax.lax.reduce_window(
        dog, -jnp.inf, jax.lax.max, (3, 3, 3), (1, 1, 1), "SAME")
    mn = jax.lax.reduce_window(
        dog, jnp.inf, jax.lax.min, (3, 3, 3), (1, 1, 1), "SAME")
    is_max = (dog >= ext) & (dog > prethresh)
    is_min = (dog <= mn) & (dog < -prethresh)
    score = jnp.where(is_max | is_min, jnp.abs(dog), 0.0)
    # only interior layers can host extrema
    L = dog.shape[0]
    layer_ok = (jnp.arange(L) >= 1) & (jnp.arange(L) <= L - 2)
    score = score * layer_ok[:, None, None]
    flat = score.reshape(-1)
    vals, idx = jax.lax.top_k(flat, budget)
    return idx, vals


def _gather27(dog: jnp.ndarray, l: jnp.ndarray, y: jnp.ndarray,
              x: jnp.ndarray) -> jnp.ndarray:
    """Gather the 3x3x3 neighborhood around (l, y, x) -> (3,3,3).

    dynamic_slice, NOT advanced indexing: gather-style indexing of the
    (L, H, W) stack lowers to a per-candidate broadcast of the whole
    array under vmap on TPU (observed 34 GB allocation); batched
    dynamic_slice stays a slice. Candidates are interior (layers 1..L-2,
    border >= 5), so the boundary clamp never shifts a real window.
    """
    L, H, W = dog.shape
    start = (jnp.clip(l - 1, 0, L - 3), jnp.clip(y - 1, 0, H - 3),
             jnp.clip(x - 1, 0, W - 3))
    return jax.lax.dynamic_slice(dog, start, (3, 3, 3))


def _refine_candidate(dog: jnp.ndarray, lin_idx: jnp.ndarray,
                      n_layers: int, contrast_thresh: float,
                      edge_thresh: float):
    """Closed-form iterative sub-pixel refinement of one candidate
    (OpenCV adjustLocalExtrema semantics; values are on a 0..255 scale so
    the 1/255 image-scale factors below match).

    Returns (ok, layer_f, y_f, x_f, response) where *_f are octave-scale
    float coords and layer_f the interpolated scale coordinate.
    """
    L, H, W = dog.shape
    img_scale = 1.0 / 255.0
    deriv_s = img_scale * 0.5
    second_s = img_scale
    cross_s = img_scale * 0.25

    l0 = lin_idx // (H * W)
    y0 = (lin_idx % (H * W)) // W
    x0 = lin_idx % W

    def step(state):
        i, l, y, x, X, ok, done = state
        n = _gather27(dog, l, y, x)
        dD = jnp.array([
            (n[1, 1, 2] - n[1, 1, 0]) * deriv_s,
            (n[1, 2, 1] - n[1, 0, 1]) * deriv_s,
            (n[2, 1, 1] - n[0, 1, 1]) * deriv_s,
        ])
        dxx = (n[1, 1, 2] + n[1, 1, 0] - 2 * n[1, 1, 1]) * second_s
        dyy = (n[1, 2, 1] + n[1, 0, 1] - 2 * n[1, 1, 1]) * second_s
        dss = (n[2, 1, 1] + n[0, 1, 1] - 2 * n[1, 1, 1]) * second_s
        dxy = (n[1, 2, 2] - n[1, 2, 0] - n[1, 0, 2] + n[1, 0, 0]) * cross_s
        dxs = (n[2, 1, 2] - n[2, 1, 0] - n[0, 1, 2] + n[0, 1, 0]) * cross_s
        dys = (n[2, 2, 1] - n[2, 0, 1] - n[0, 2, 1] + n[0, 0, 1]) * cross_s
        Hm = jnp.array([[dxx, dxy, dxs],
                        [dxy, dyy, dys],
                        [dxs, dys, dss]])
        # guarded 3x3 solve: X = -H^-1 dD
        det = jnp.linalg.det(Hm)
        Hm_safe = jnp.where(jnp.abs(det) < 1e-20, jnp.eye(3), Hm)
        Xn = -jnp.linalg.solve(Hm_safe, dD)
        Xn = jnp.where(jnp.abs(det) < 1e-20, jnp.zeros(3), Xn)
        converged = jnp.all(jnp.abs(Xn) < 0.5)
        diverged = jnp.any(jnp.abs(Xn) > 10.0)  # float-overflow guard
        nl = jnp.clip(l + jnp.round(Xn[2]).astype(jnp.int32), 0, L - 1)
        ny = y + jnp.round(Xn[1]).astype(jnp.int32)
        nx = x + jnp.round(Xn[0]).astype(jnp.int32)
        in_bounds = ((nl >= 1) & (nl <= n_layers)
                     & (ny >= _IMG_BORDER) & (ny < H - _IMG_BORDER)
                     & (nx >= _IMG_BORDER) & (nx < W - _IMG_BORDER))
        new_done = done | converged | diverged | (~in_bounds)
        new_ok = jnp.where(done, ok, converged & in_bounds & (~diverged))
        keep = done | converged
        return (i + 1,
                jnp.where(keep, l, nl), jnp.where(keep, y, ny),
                jnp.where(keep, x, nx),
                jnp.where(done, X, Xn), new_ok, new_done)

    init = (0, l0, y0, x0, jnp.zeros(3), jnp.array(False), jnp.array(False))
    state = init
    for _ in range(_MAX_INTERP_STEPS):
        state = jax.lax.cond(state[6], lambda s: s, step, state)
    _, l, y, x, X, ok, _ = state

    # contrast response at the refined point
    n = _gather27(dog, l, y, x)
    dD = jnp.array([
        (n[1, 1, 2] - n[1, 1, 0]) * deriv_s,
        (n[1, 2, 1] - n[1, 0, 1]) * deriv_s,
        (n[2, 1, 1] - n[0, 1, 1]) * deriv_s,
    ])
    contr = n[1, 1, 1] * img_scale + 0.5 * jnp.dot(dD, X)
    ok = ok & (jnp.abs(contr) * n_layers >= contrast_thresh)

    # edge response: 2x2 spatial Hessian
    dxx = (n[1, 1, 2] + n[1, 1, 0] - 2 * n[1, 1, 1]) * second_s
    dyy = (n[1, 2, 1] + n[1, 0, 1] - 2 * n[1, 1, 1]) * second_s
    dxy = (n[1, 2, 2] - n[1, 2, 0] - n[1, 0, 2] + n[1, 0, 0]) * cross_s
    tr = dxx + dyy
    det2 = dxx * dyy - dxy * dxy
    r = edge_thresh
    ok = ok & (det2 > 0) & (tr * tr * r < (r + 1) * (r + 1) * det2)

    return (ok,
            l.astype(jnp.float32) + X[2],
            y.astype(jnp.float32) + X[1],
            x.astype(jnp.float32) + X[0],
            jnp.abs(contr))


# ---------------------------------------------------------------------------
# Canonical-grid sampling helpers
# ---------------------------------------------------------------------------

def _bilinear(stack: jnp.ndarray, l: jnp.ndarray, ys: jnp.ndarray,
              xs: jnp.ndarray) -> jnp.ndarray:
    """Bilinear sample of level ``l`` of a (L, H, W) stack at float coords.

    Linearized gather (folding the layer into the row index): multidim
    advanced indexing with a traced layer lowers to a per-keypoint
    broadcast of the whole stack under vmap on TPU; a flat gather from
    the (L*H*W,) view stays a gather.
    """
    L, H, W = stack.shape
    flat = stack.reshape(-1)
    x0 = jnp.clip(jnp.floor(xs), 0, W - 2).astype(jnp.int32)
    y0 = jnp.clip(jnp.floor(ys), 0, H - 2).astype(jnp.int32)
    fx = jnp.clip(xs - x0, 0.0, 1.0)
    fy = jnp.clip(ys - y0, 0.0, 1.0)
    base = l * (H * W) + y0 * W + x0
    v00 = flat[base]
    v01 = flat[base + 1]
    v10 = flat[base + W]
    v11 = flat[base + W + 1]
    return ((v00 * (1 - fx) + v01 * fx) * (1 - fy)
            + (v10 * (1 - fx) + v11 * fx) * fy)


def _grad_at(stack: jnp.ndarray, l: jnp.ndarray, ys: jnp.ndarray,
             xs: jnp.ndarray):
    """Central-difference gradient, bilinearly sampled: (gx, gy)."""
    gx = _bilinear(stack, l, ys, xs + 1.0) - _bilinear(stack, l, ys, xs - 1.0)
    gy = _bilinear(stack, l, ys - 1.0, xs) - _bilinear(stack, l, ys + 1.0, xs)
    # note: OpenCV uses dy = I(y-1) - I(y+1) (upward-positive), kept here
    return gx, gy


def _orientation(stack: jnp.ndarray, l: jnp.ndarray, y: jnp.ndarray,
                 x: jnp.ndarray, scl_octv: jnp.ndarray) -> jnp.ndarray:
    """Dominant gradient orientation (degrees, [0, 360)).

    Fixed _ORI_GRID^2 canonical samples over radius 4.5*sigma replace
    OpenCV's variable-radius pixel loop (calcOrientationHist).
    """
    G = _ORI_GRID
    lin = np.linspace(-1.0, 1.0, G, dtype=np.float32)
    gy, gx = np.meshgrid(lin, lin, indexing="ij")
    offs = jnp.asarray(np.stack([gy.ravel(), gx.ravel()], 1))  # (G*G, 2)
    radius = _ORI_RADIUS * scl_octv
    ys = y + offs[:, 0] * radius
    xs = x + offs[:, 1] * radius
    dx, dy = _grad_at(stack, l, ys, xs)
    mag = jnp.sqrt(dx * dx + dy * dy)
    ang = jnp.degrees(jnp.arctan2(dy, dx)) % 360.0
    # Gaussian weight with sigma = 1.5 * scl_octv over true distance
    d2 = (offs[:, 0] * radius) ** 2 + (offs[:, 1] * radius) ** 2
    w = jnp.exp(-d2 / (2.0 * (_ORI_SIG_FCTR * scl_octv) ** 2))
    wmag = mag * w

    bins = ang * (_ORI_HIST_BINS / 360.0)
    b0 = jnp.floor(bins)
    fb = bins - b0
    b0 = b0.astype(jnp.int32) % _ORI_HIST_BINS
    b1 = (b0 + 1) % _ORI_HIST_BINS
    oh0 = jax.nn.one_hot(b0, _ORI_HIST_BINS) * ((1 - fb) * wmag)[:, None]
    oh1 = jax.nn.one_hot(b1, _ORI_HIST_BINS) * (fb * wmag)[:, None]
    hist = jnp.sum(oh0 + oh1, axis=0)
    # circular smooth [1,4,6,4,1]/16, applied like OpenCV
    h = hist
    hm1, hp1 = jnp.roll(h, 1), jnp.roll(h, -1)
    hm2, hp2 = jnp.roll(h, 2), jnp.roll(h, -2)
    hist = (6 * h + 4 * (hm1 + hp1) + (hm2 + hp2)) / 16.0

    k = jnp.argmax(hist)
    hk = hist[k]
    hl = hist[(k - 1) % _ORI_HIST_BINS]
    hr = hist[(k + 1) % _ORI_HIST_BINS]
    denom = hl - 2 * hk + hr
    interp = jnp.where(jnp.abs(denom) > 1e-12,
                       0.5 * (hl - hr) / denom, 0.0)
    bin_f = (k + interp) % _ORI_HIST_BINS
    return 360.0 - bin_f * (360.0 / _ORI_HIST_BINS)  # OpenCV convention


def _descr_spatial_weights() -> np.ndarray:
    """Static (_DESCR_GRID^2, d*d) trilinear spatial weights of the
    canonical descriptor grid, plus the Gaussian window baked in."""
    d = _DESCR_WIDTH
    S = _DESCR_GRID
    # sample centers in cell units, covering [-d/2, d/2]
    lin = (np.arange(S, dtype=np.float64) + 0.5) / S * d - d / 2.0
    rr, cc = np.meshgrid(lin, lin, indexing="ij")
    # histogram coords: rbin/cbin in [-0.5, d-0.5] like OpenCV
    rbin = rr.ravel() + d / 2.0 - 0.5
    cbin = cc.ravel() + d / 2.0 - 0.5
    gw = np.exp(-(rr.ravel() ** 2 + cc.ravel() ** 2) / (0.5 * d * d))
    Wmat = np.zeros((S * S, d * d), np.float32)
    r0 = np.floor(rbin).astype(int)
    c0 = np.floor(cbin).astype(int)
    fr = rbin - r0
    fc = cbin - c0
    for dr in (0, 1):
        for dc in (0, 1):
            r = r0 + dr
            c = c0 + dc
            wgt = (fr if dr else 1 - fr) * (fc if dc else 1 - fc) * gw
            okm = (r >= 0) & (r < d) & (c >= 0) & (c < d)
            idx = np.clip(r, 0, d - 1) * d + np.clip(c, 0, d - 1)
            for s in range(S * S):
                if okm[s]:
                    Wmat[s, idx[s]] += wgt[s]
    return Wmat


_DESCR_W = _descr_spatial_weights()  # module-level static


def _descriptor(stack: jnp.ndarray, l: jnp.ndarray, y: jnp.ndarray,
                x: jnp.ndarray, scl_octv: jnp.ndarray,
                angle_deg: jnp.ndarray) -> jnp.ndarray:
    """128-D SIFT descriptor via canonical-grid resampling + einsum binning."""
    d, n, S = _DESCR_WIDTH, _DESCR_HIST_BINS, _DESCR_GRID
    hist_width = _DESCR_SCL_FCTR * scl_octv
    ori = 360.0 - angle_deg                  # OpenCV: ori = 360 - kpt.angle
    theta = jnp.deg2rad(ori)
    ct, st = jnp.cos(theta), jnp.sin(theta)

    lin = (np.arange(S, dtype=np.float32) + 0.5) / S * d - d / 2.0
    rr, cc = np.meshgrid(lin, lin, indexing="ij")
    rr = jnp.asarray(rr.ravel())
    cc = jnp.asarray(cc.ravel())
    # inverse of OpenCV's (c_rot = j cos - i sin, r_rot = j sin + i cos):
    # image offsets from descriptor-frame coords
    xs = x + (cc * ct + rr * st) * hist_width
    ys = y + (-cc * st + rr * ct) * hist_width

    dx, dy = _grad_at(stack, l, ys, xs)
    mag = jnp.sqrt(dx * dx + dy * dy)
    ang = jnp.degrees(jnp.arctan2(dy, dx)) % 360.0
    rel = (ang - ori) * (n / 360.0)

    ob = rel % n
    o0 = jnp.floor(ob)
    fo = ob - o0
    o0 = o0.astype(jnp.int32) % n
    o1 = (o0 + 1) % n
    O = (jax.nn.one_hot(o0, n) * (1 - fo)[:, None]
         + jax.nn.one_hot(o1, n) * fo[:, None])          # (S*S, n)

    Wmat = jnp.asarray(_DESCR_W)                          # (S*S, d*d)
    hist = jnp.einsum("sc,s,sn->cn", Wmat, mag, O,
                      preferred_element_type=jnp.float32)  # (d*d, n)
    vec = hist.reshape(-1)
    # normalize, clip at 0.2, renormalize (calcSIFTDescriptor)
    nrm = jnp.linalg.norm(vec)
    vec = jnp.minimum(vec, _DESCR_MAG_THR * jnp.maximum(nrm, 1e-12))
    nrm2 = jnp.linalg.norm(vec)
    return vec / jnp.maximum(nrm2, 1e-12)


# ---------------------------------------------------------------------------
# Full extraction
# ---------------------------------------------------------------------------

def _num_octaves(h: int, w: int) -> int:
    """Octave count for the doubled base image; smallest level >= 16 px."""
    return max(1, int(math.floor(math.log2(min(h, w) / 16.0))) + 1)


@functools.partial(
    jax.jit,
    static_argnames=("max_kp", "n_layers", "contrast_thresh",
                     "edge_thresh", "sigma", "upscale"))
def extract_sift(img_gray: jnp.ndarray,
                 valid_hw: jnp.ndarray,
                 max_kp: int = 1024,
                 n_layers: int = 4,
                 contrast_thresh: float = 0.03,
                 edge_thresh: float = 6.0,
                 sigma: float = 1.4142,
                 upscale: bool = True) -> SiftFeatures:
    """Detect + describe SIFT features of one grayscale image.

    img_gray: (H, W) float32, 0..255 scale; content may occupy only the
      top-left ``valid_hw = (h, w)`` region (replicate-padded outside).
    Returns fixed-capacity ``SiftFeatures`` with original-image pixel
    coordinates (not yet center-shifted).
    """
    H, W = img_gray.shape
    if upscale:
        base = jax.image.resize(img_gray, (H * 2, W * 2), "linear")
        sig_diff = math.sqrt(max(sigma * sigma - 4 * 0.25, 0.01))
        first_octave = -1
    else:
        base = img_gray
        sig_diff = math.sqrt(max(sigma * sigma - 0.25, 0.01))
        first_octave = 0
    base = _blur(base, sig_diff)
    n_oct = _num_octaves(*base.shape)

    gauss = build_pyramid(base, sigma, n_layers, n_oct)
    dogs = [g[1:] - g[:-1] for g in gauss]

    prethresh = 0.5 * contrast_thresh / n_layers * 255.0
    budget = max_kp  # per-octave candidate budget

    all_resp, all_xy, all_size, all_valid = [], [], [], []
    all_oct, all_layer, all_ypix, all_xpix = [], [], [], []
    vh = valid_hw[0].astype(jnp.float32)
    vw = valid_hw[1].astype(jnp.float32)

    for o in range(n_oct):
        dog = dogs[o]
        idx, score = _find_candidates(dog, prethresh, min(
            budget, int(np.prod(dog.shape))))
        pad = budget - idx.shape[0]
        if pad > 0:
            idx = jnp.pad(idx, (0, pad))
            score = jnp.pad(score, (0, pad))
        ok0 = score > 0

        ok, l_f, y_f, x_f, resp = jax.vmap(
            lambda i: _refine_candidate(dog, i, n_layers,
                                        contrast_thresh, edge_thresh))(idx)
        ok = ok & ok0
        scale_mult = 2.0 ** (o + first_octave)
        x_img = x_f * scale_mult
        y_img = y_f * scale_mult
        size = sigma * (2.0 ** (l_f / n_layers)) * scale_mult * 2.0
        # inside the valid region (pad area breeds replicate-border extrema)
        m = 2.0  # px margin in original coords
        ok = ok & (x_img >= m) & (x_img <= vw - 1 - m) \
               & (y_img >= m) & (y_img <= vh - 1 - m)

        all_resp.append(jnp.where(ok, resp, -1.0))
        all_xy.append(jnp.stack([x_img, y_img], -1))
        all_size.append(size)
        all_valid.append(ok)
        all_oct.append(jnp.full((budget,), o, jnp.int32))
        all_layer.append(jnp.clip(jnp.round(l_f), 1, n_layers).astype(jnp.int32))
        all_ypix.append(y_f)
        all_xpix.append(x_f)

    resp = jnp.concatenate(all_resp)
    top_resp, top_i = jax.lax.top_k(resp, max_kp)
    sel_xy = jnp.concatenate(all_xy)[top_i]
    sel_size = jnp.concatenate(all_size)[top_i]
    sel_valid = jnp.concatenate(all_valid)[top_i] & (top_resp > 0)
    sel_oct = jnp.concatenate(all_oct)[top_i]
    sel_layer = jnp.concatenate(all_layer)[top_i]
    sel_y = jnp.concatenate(all_ypix)[top_i]
    sel_x = jnp.concatenate(all_xpix)[top_i]

    # orientation + descriptor, per octave (static loop, masked updates)
    angle = jnp.zeros((max_kp,))
    desc = jnp.zeros((max_kp, _DESCR_WIDTH * _DESCR_WIDTH * _DESCR_HIST_BINS))
    for o in range(n_oct):
        g_oct = gauss[o]  # (n_layers+3, H_o, W_o)
        in_oct = sel_oct == o
        scl_octv = sel_size * 0.5 / (2.0 ** (o + first_octave))

        def per_kp(layer, y, x, so, stack=g_oct):
            a = _orientation(stack, layer, y, x, so)
            dvec = _descriptor(stack, layer, y, x, so, a)
            return a, dvec

        a_o, d_o = jax.vmap(per_kp)(sel_layer, sel_y, sel_x, scl_octv)
        angle = jnp.where(in_oct, a_o, angle)
        desc = jnp.where(in_oct[:, None], d_o, desc)

    # rootSIFT: L1-normalize + sqrt (convert_to_rootsift)
    l1 = jnp.sum(jnp.abs(desc), axis=1, keepdims=True)
    desc = jnp.sqrt(desc / jnp.maximum(l1, 1e-12))
    desc = jnp.where(sel_valid[:, None], desc, 0.0)

    return SiftFeatures(
        xy=jnp.where(sel_valid[:, None], sel_xy, 0.0),
        size=jnp.where(sel_valid, sel_size, 0.0),
        response=jnp.where(sel_valid, top_resp, 0.0),
        desc=desc,
        valid=sel_valid,
    )
