"""Full-resolution streaming device render (render.fullres) vs the host
oracle path (stitcher.render_full_host), and its two mesh schedules.

The 'full res' here is the 700-px fixture set rendered from a 400-px
preview stitch — the same preview/full split the reference uses
(return_full, /root/reference/src/classes/_panorama.cpp:259-354), small
enough for the CPU CI mesh."""

import dataclasses

import numpy as np
import pytest

from simplepanorama_tpu.config import Config, Blending
from simplepanorama_tpu import stitcher
from simplepanorama_tpu.io import ImageSet

# real-sequence renders: minutes of XLA compile + compute on the CPU CI
# mesh (fast synthetic coverage of the same kernels lives in test_tiled)
pytestmark = pytest.mark.slow


@pytest.fixture(autouse=True, scope="module")
def _no_persistent_compile_cache():
    """Serializing one of this module's blend executables for the
    persistent compile cache segfaults deterministically inside
    compilation_cache.put_executable_and_time (zstd on that specific
    payload; reproduced twice at test_fullres_other_blends_match_host
    with no concurrent process). Compiles here are module-local anyway,
    so turn the persistent cache off for the module."""
    import jax
    old = jax.config.jax_compilation_cache_dir
    jax.config.update("jax_compilation_cache_dir", None)
    yield
    jax.config.update("jax_compilation_cache_dir", old)


def _cfg(**kw):
    c = Config()
    c.init_size = 400
    c.RANSAC_iterations = 400
    for k, v in kw.items():
        setattr(c, k, v)
    return c


@pytest.fixture(scope="module")
def map_stitch(map_images):
    paths, full_imgs = map_images
    cfg = _cfg()
    images = ImageSet(paths)
    res, params, _ = stitcher.run_pipeline(images, cfg)
    comp_full = [full_imgs[g] for g in res.nodes]
    return res, params, cfg, comp_full


def _agree(a, b, max_frac=0.01, max_mean=1.5, tol=3):
    a = a.astype(np.float32)
    b = b.astype(np.float32)
    assert a.shape == b.shape
    diff = np.abs(a - b)
    frac = float((diff > tol).mean())
    mean = float(diff.mean())
    assert frac < max_frac, f"{frac:.4%} pixels differ by >{tol}"
    assert mean < max_mean, f"mean abs diff {mean:.3f}"


def test_fullres_multi_matches_host(map_stitch):
    res, params, cfg, comp_full = map_stitch
    host = stitcher.render_full_host(params, cfg, comp_full)
    from simplepanorama_tpu.render.fullres import render_full_dev
    dev = render_full_dev(params, cfg, comp_full, force_single=True)
    # differences: cv2 INTER_CUBIC vs the device cubic matrix at seam-mask
    # edges, float reassociation in the band sums
    _agree(host, dev)


def test_fullres_canvas_sharded_matches_single(map_stitch):
    res, params, cfg, comp_full = map_stitch
    from simplepanorama_tpu.render.fullres import render_full_dev
    single = render_full_dev(params, cfg, comp_full, force_single=True)
    # 6 images < 8 devices -> the canvas-column (warp_tiled) schedule
    sharded = stitcher.render_full(params, cfg, comp_full)
    _agree(single, sharded, max_frac=0.005, max_mean=0.5)


def test_fullres_dp_sharded_matches_single(map_stitch):
    res, params, cfg, comp_full = map_stitch
    from simplepanorama_tpu.render.fullres import render_full_dev
    from simplepanorama_tpu.parallel.mesh import make_mesh
    single = render_full_dev(params, cfg, comp_full, force_single=True)
    # 6 images >= 4 devices -> the image-DP schedule (uneven shard: 6/4)
    sharded = render_full_dev(params, cfg, comp_full, mesh=make_mesh(4))
    _agree(single, sharded, max_frac=0.005, max_mean=0.5)


def test_fullres_chunked_equals_unchunked(map_stitch, monkeypatch):
    res, params, cfg, comp_full = map_stitch
    from simplepanorama_tpu.render import fullres
    one = fullres.render_full_dev(params, cfg, comp_full,
                                  force_single=True)
    # force 2-image chunks: accumulation must be chunking-invariant
    monkeypatch.setattr(fullres, "_CHUNK_BUDGET", 1)
    # budget 1 byte -> G=1; also exercise the padded trailing chunk
    chunked = fullres.render_full_dev(params, cfg, comp_full,
                                      force_single=True)
    _agree(one, chunked, max_frac=0.002, max_mean=0.2)


@pytest.mark.parametrize("blend", [Blending.NO_BLEND,
                                   Blending.SIMPLE_BLEND])
def test_fullres_other_blends_match_host(map_stitch, blend):
    res, params, cfg0, comp_full = map_stitch
    cfg = dataclasses.replace(cfg0, blend=blend)
    host = stitcher.render_full_host(params, cfg, comp_full)
    from simplepanorama_tpu.render.fullres import render_full_dev
    dev = render_full_dev(params, cfg, comp_full, force_single=True)
    _agree(host, dev, max_frac=0.02)


def test_fullres_gain_and_intensity(map_images):
    """Gain compensation + intensity fields reused at full res."""
    paths, full_imgs = map_images
    cfg = _cfg(gain_compensation=True, blend_intensity=True)
    images = ImageSet(paths)
    res, params, _ = stitcher.run_pipeline(images, cfg)
    comp_full = [full_imgs[g] for g in res.nodes]
    host = stitcher.render_full_host(params, cfg, comp_full)
    from simplepanorama_tpu.render.fullres import render_full_dev
    dev = render_full_dev(params, cfg, comp_full, force_single=True)
    _agree(host, dev)
