"""Test configuration: run JAX on a virtual 8-device CPU mesh so sharding
code paths execute in CI without TPU hardware (the 'fake backend' the
reference lacks — SURVEY §4)."""

import os

# must be set before jax is imported anywhere; the ambient environment may
# point JAX at a real accelerator (JAX_PLATFORMS=axon/tpu) — tests always run
# on the virtual CPU mesh unless SPT_TEST_PLATFORM overrides.
_platform = os.environ.get("SPT_TEST_PLATFORM", "cpu")
os.environ["JAX_PLATFORMS"] = _platform
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

# The environment may pre-register an accelerator backend via sitecustomize
# before env vars are consulted; jax.config is the authoritative override.
import jax  # noqa: E402

jax.config.update("jax_platforms", _platform)

import numpy as np
import pytest

REFERENCE = "/root/reference"


@pytest.fixture(scope="session")
def map_images():
    """The 6-image 'map' sequence at working resolution (700 px max side)."""
    import glob
    import cv2
    from simplepanorama_tpu.io import clamp_to_init_size
    paths = sorted(glob.glob(f"{REFERENCE}/results/map/budapest*.jpg"))
    imgs = [clamp_to_init_size(cv2.imread(p), 700) for p in paths]
    return paths, imgs


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)
