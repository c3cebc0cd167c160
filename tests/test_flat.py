"""Flat-plane rendering: homography warp oracle checks, the legacy
pairwise stitch, and the chained-homography panorama."""

import numpy as np
import jax.numpy as jnp

from simplepanorama_tpu.render.flat import (
    warp_perspective, pairwise_stitch, render_flat)
from simplepanorama_tpu.geometry.canvas import calc_stitch_from_adj


def test_warp_perspective_identity():
    rng = np.random.default_rng(0)
    img = rng.uniform(0, 255, (32, 48, 3)).astype(np.float32)
    out, mask = warp_perspective(jnp.asarray(img),
                                 jnp.asarray(np.eye(3, dtype=np.float32)),
                                 32, 48)
    np.testing.assert_allclose(np.asarray(out), img, atol=1e-3)
    assert np.asarray(mask).all()


def test_warp_perspective_translation_matches_shift():
    rng = np.random.default_rng(1)
    img = rng.uniform(0, 255, (40, 40, 3)).astype(np.float32)
    # H maps source -> dest shifted by (+5, +3); the warp takes H_inv
    H = np.eye(3)
    H[0, 2] = 5.0
    H[1, 2] = 3.0
    out, mask = warp_perspective(jnp.asarray(img),
                                 jnp.asarray(np.linalg.inv(H).astype(
                                     np.float32)), 40, 40)
    out = np.asarray(out)
    np.testing.assert_allclose(out[3:, 5:], img[:-3, :-5], atol=1e-2)
    assert not np.asarray(mask)[0, 0]


def test_pairwise_stitch_extends_canvas():
    rng = np.random.default_rng(2)
    base = rng.integers(40, 255, (50, 60, 3)).astype(np.uint8)
    attach = rng.integers(40, 255, (50, 60, 3)).astype(np.uint8)
    H = np.eye(3)
    H[0, 2] = 40.0  # attach sits 40px right of base
    out = pairwise_stitch(base, attach, H)
    assert out.shape[0] >= 50 and out.shape[1] >= 100
    # base pasted on top at origin
    np.testing.assert_array_equal(out[:50, :60], base)
    # attach visible beyond base's extent
    np.testing.assert_allclose(out[:50, 61:100].astype(np.float32),
                               attach[:50, 21:60].astype(np.float32),
                               atol=2.0)


def test_render_flat_two_image_chain():
    rng = np.random.default_rng(3)
    imgs = [rng.integers(40, 255, (40, 50, 3)).astype(np.uint8)
            for _ in range(2)]
    adj = np.zeros((2, 2))
    adj[0, 1] = 1.0
    hom = np.zeros((2, 2, 3, 3))
    hom[:] = np.eye(3)
    hom[0, 1, 0, 2] = 30.0   # image 1 -> image 0 shifted right by 30
    hom[1, 0, 0, 2] = -30.0
    conn = np.array([1.0, 0.5])
    tr = calc_stitch_from_adj(adj, conn, [(40, 50), (40, 50)], hom,
                              focal=700.0, fast=False)
    out = render_flat(tr, imgs)
    assert out.shape[:2] == (40, 80)
    np.testing.assert_array_equal(out[:, :50], imgs[0])
    np.testing.assert_allclose(out[:, 51:79].astype(np.float32),
                               imgs[1][:, 21:49].astype(np.float32), atol=2.0)
