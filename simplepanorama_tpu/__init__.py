"""simplepanorama_tpu — a TPU-native panorama-stitching framework.

A from-scratch JAX/XLA/Pallas reimplementation of the full pipeline of
SimplePanorama (Brown & Lowe, "Automatic Panoramic Image Stitching using
Invariant Features", IJCV 2007, plus the reference's deliberate changes:
rootSIFT, overlap-aware match verification, a relaxed bundle-adjustment
objective, graph-cut seams, cylindrical/stereographic projections with a
missing-center fix, exposure-disparity fix, and auto-straightening).

Design is TPU-first:
  * every numeric kernel is a fixed-shape JAX program (vmapped/batched,
    MXU-friendly matmuls for descriptor matching, batched RANSAC),
  * bundle adjustment is a jitted Levenberg-Marquardt step with a
    Schur-complement solve whose normal-equation accumulations are
    segment-sums (psum-reducible across a device mesh),
  * compositing (warp/seam/blend) is expressed as gathers and separable
    convolutions over a tiled panorama canvas,
  * distribution uses jax.sharding Meshes and XLA collectives, not threads.

The capability surface mirrors the reference (see SURVEY.md): a library API
shaped like the reference's headless path (/root/reference/src/main.cpp:43-66),
a CLI, config-file round-tripping, progress/cancellation, preview + full-res
rendering, and crop/save.
"""

import os as _os

# persistent XLA compilation cache: cold compiles of the larger programs
# (SIFT pyramid, pair verification, the fused BA while_loop, the Pallas
# min-cut, the full-res scan) cost minutes against a remote TPU; the cache
# makes every run after the first start in seconds. Opt out by setting
# JAX_COMPILATION_CACHE_DIR yourself (any value, including empty).
_os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/spt_jax_cache")
if _os.environ["JAX_COMPILATION_CACHE_DIR"]:
    try:  # the env var alone is not honored on every backend; the config
        # update is (measured: a run with only the env var wrote nothing)
        import jax as _jax
        _jax.config.update("jax_compilation_cache_dir",
                           _os.environ["JAX_COMPILATION_CACHE_DIR"])
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass

from simplepanorama_tpu.config import (
    Blending,
    Projection,
    Stretch,
    Config,
    read_config_file,
    write_config_file,
)
from simplepanorama_tpu.pipeline import Panorama, StitchCancelled
from simplepanorama_tpu.viewer import PanoramaViewer

__version__ = "0.1.0"

__all__ = [
    "Blending",
    "Projection",
    "Stretch",
    "Config",
    "read_config_file",
    "write_config_file",
    "Panorama",
    "PanoramaViewer",
    "StitchCancelled",
]
