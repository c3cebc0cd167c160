"""Spatially-sharded compositing (parallel.tiled_compose) vs the
single-device kernels, on the virtual 8-device CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from simplepanorama_tpu.parallel.mesh import make_mesh
from simplepanorama_tpu.parallel import tiled_compose as tc
from simplepanorama_tpu.render.blending import multi_blend
from simplepanorama_tpu.render.projection import warp_backward


def _random_blocks(rng, n=5, Hb=40, Wb=128, H=96, W=320):
    imgs = rng.uniform(0, 255, (n, Hb, Wb, 3)).astype(np.float32)
    origs = np.zeros((n, Hb, Wb), np.float32)
    seams = np.zeros((n, Hb, Wb), np.float32)
    offs = np.zeros((n, 2), np.int32)
    for i in range(n):
        h = rng.integers(20, Hb + 1)
        w = rng.integers(60, Wb + 1)
        origs[i, :h, :w] = 1.0
        # seam = random sub-rectangle of the footprint
        y0, x0 = rng.integers(0, 5), rng.integers(0, 20)
        seams[i, y0:h, x0:w] = 1.0
        offs[i] = (rng.integers(0, H - Hb + 1), rng.integers(0, W - Wb + 1))
    return (jnp.asarray(imgs), jnp.asarray(seams), jnp.asarray(origs),
            jnp.asarray(offs))


def test_multi_blend_sharded_matches_single(rng):
    imgs, seams, origs, offs = _random_blocks(rng)
    hw = (96, 320)
    ref = np.asarray(multi_blend(imgs, seams, origs, offs, hw,
                                 bands=2, sigma=5.0))
    mesh = make_mesh(8)
    out = np.asarray(tc.multi_blend_sharded(imgs, seams, origs, offs, hw,
                                            mesh, bands=2, sigma=5.0))
    assert out.shape == ref.shape
    # pure-sum schedule: only float reassociation differs
    np.testing.assert_allclose(out, ref, atol=2e-2)


def test_multi_blend_sharded_uneven_batch(rng):
    # N=3 not divisible by 8 devices: padding entries must contribute 0
    imgs, seams, origs, offs = _random_blocks(rng, n=3)
    hw = (96, 320)
    ref = np.asarray(multi_blend(imgs, seams, origs, offs, hw,
                                 bands=3, sigma=3.0))
    mesh = make_mesh(8)
    out = np.asarray(tc.multi_blend_sharded(imgs, seams, origs, offs, hw,
                                            mesh, bands=3, sigma=3.0))
    np.testing.assert_allclose(out, ref, atol=2e-2)


def test_warp_tiled_matches_full(rng):
    H, W = 64, 96
    img = jnp.asarray(rng.uniform(0, 255, (H, W, 3)).astype(np.float32))
    from simplepanorama_tpu.render.projection import (roi_for_image,
                                                      adjusted_K)
    K0 = np.array([[120.0, 0, W / 2], [0, 120.0, H / 2], [0, 0, 1]],
                  np.float64)
    R = np.eye(3, dtype=np.float32)
    tlx, tly, rw, rh = roi_for_image("spherical", 120.0, R, K0, H, W)
    K = adjusted_K(K0, H, W).astype(np.float32)
    corner = jnp.asarray([tlx, tly], jnp.float32)
    vhw = jnp.asarray([H, W], jnp.int32)
    out_h, out_w = rh + 6, rw + 10
    ref_w, ref_m = warp_backward(img, jnp.asarray(K), jnp.asarray(R),
                                 corner, 120.0, "spherical", out_h, out_w,
                                 vhw)
    mesh = make_mesh(8)
    t_w, t_m = tc.warp_tiled(img, jnp.asarray(K), jnp.asarray(R), corner,
                             120.0, "spherical", out_h, out_w, vhw, mesh)
    assert np.asarray(ref_m).sum() > 100  # footprint non-trivial
    # same math, different XLA fusion choices under shard_map: float-level
    # noise only (values are on the 0..255 scale)
    np.testing.assert_allclose(np.asarray(t_w), np.asarray(ref_w),
                               atol=0.05)
    np.testing.assert_array_equal(np.asarray(t_m), np.asarray(ref_m))


def test_halo_exchange_roundtrip():
    from jax import shard_map
    from jax.sharding import PartitionSpec as P
    mesh = make_mesh(8)
    W = 8 * 4
    x = jnp.arange(2 * W, dtype=jnp.float32).reshape(2, W)
    halo = 2

    def body(xl):
        padded = tc.halo_exchange(xl, halo, "data")
        # each local slab must see its global neighbors' columns
        return padded

    f = shard_map(body, mesh=mesh, in_specs=P(None, "data"),
                  out_specs=P(None, "data"))
    out = np.asarray(jax.jit(f)(x))          # (2, 8*(4+2*halo))
    xs = np.asarray(x)
    for d in range(8):
        sl = out[:, d * (4 + 2 * halo):(d + 1) * (4 + 2 * halo)]
        lo = d * 4 - halo
        hi = (d + 1) * 4 + halo
        expect = np.zeros((2, 4 + 2 * halo), np.float32)
        src_lo = max(lo, 0)
        src_hi = min(hi, W)
        expect[:, src_lo - lo:src_hi - lo] = xs[:, src_lo:src_hi]
        np.testing.assert_array_equal(sl, expect)


def test_fullres_sharded_schedules_smoke():
    """Both full-res mesh schedules (image-DP and the canvas-column
    warp_tiled pattern) compile and agree on a tiny synthetic problem;
    the real-sequence parity lives in test_fullres (slow)."""
    from simplepanorama_tpu.parallel import tiled_compose as tc
    m, Hs, Ws = 3, 32, 48
    rng_l = np.random.default_rng(0)
    src = jnp.asarray(rng_l.integers(0, 255, (m, Hs, Ws, 3)).astype(
        np.uint8))
    Ka = jnp.tile((jnp.eye(3) * jnp.asarray([40., 40., 1.])[:, None])
                  .astype(jnp.float32), (m, 1, 1))
    R = jnp.tile(jnp.eye(3, dtype=jnp.float32), (m, 1, 1))
    corner = jnp.asarray([[0., 0.], [10., 0.], [20., 0.]], jnp.float32)
    vhw = jnp.asarray([[32, 48]] * m, jnp.int32)
    wh = jnp.asarray([[40, 30]] * m, jnp.int32)
    offs = jnp.asarray([[0, 0], [0, 10], [0, 20]], jnp.int32)
    sb = jnp.ones((m, 16, 24), jnp.float32)
    sr = jnp.full((m, 2), 0.5, jnp.float32)
    fb = jnp.zeros((m, 1, 1), jnp.float32)
    fr = jnp.ones((m, 2), jnp.float32)
    g = jnp.ones((m,), jnp.float32)
    kw = dict(scale=40.0, kind="spherical", canvas_hw=(64, 256),
              min_xy=(0, 0), bands=2, sigma=3.0, use_seam=True,
              use_field=False, mesh=make_mesh(8))
    canvas = np.asarray(tc.fullres_multi_canvas(
        src, Ka, R, corner, vhw, wh, offs, sb, sr, fb, fr, g, **kw))
    dp = np.asarray(tc.fullres_multi_dp(
        src, (40, 128), Ka, R, corner, vhw, wh, offs, sb, sr, fb, fr, g,
        **kw))
    assert canvas.shape == dp.shape == (64, 256, 3)
    diff = np.abs(canvas.astype(np.float32) - dp.astype(np.float32))
    assert (diff > 2).mean() < 0.01, f"{(diff > 2).mean():.4f}"
