"""Feature-extraction front end: batch images onto the device, run the
fixed-shape SIFT program, return center-origin keypoints + rootSIFT
descriptors.

Capability mirror of img::images::calculate_keypoints
(/root/reference/src/classes/_image.cpp:105-166) and util::extract_keypoints
(/root/reference/src/math/_homography.cpp:727-751): grayscale conversion,
SIFT with the config's parameters, rootSIFT transform, and keypoint
coordinates shifted to an image-center origin (integer half-size, matching
the reference's ``pt.x - img.cols / 2``).

The reference fans out one std::async task per image; here every image runs
through ONE compiled XLA program (all images are replicate-padded to a
common shape so a single jit cache entry serves the whole set), and the
batch dimension is the unit of data parallelism for multi-device sharding.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, List, Optional, Sequence

import numpy as np
import jax
import jax.numpy as jnp

from simplepanorama_tpu.config import Config
from simplepanorama_tpu.ops.sift import extract_sift, extract_sift_batch


@dataclasses.dataclass
class Features:
    """Per-image fixed-capacity features (host-side numpy views)."""
    xy: np.ndarray        # (K, 2) float32, center-origin (x, y)
    size: np.ndarray      # (K,)
    response: np.ndarray  # (K,)
    desc: np.ndarray      # (K, 128) rootSIFT
    valid: np.ndarray     # (K,) bool

    @property
    def count(self) -> int:
        return int(self.valid.sum())


def _to_gray(img_bgr: np.ndarray) -> np.ndarray:
    """BGR uint8 -> float32 grayscale on the 0..255 scale (OpenCV weights)."""
    b = img_bgr[..., 0].astype(np.float32)
    g = img_bgr[..., 1].astype(np.float32)
    r = img_bgr[..., 2].astype(np.float32)
    return 0.114 * b + 0.587 * g + 0.299 * r


def _pad_to(img: np.ndarray, H: int, W: int) -> np.ndarray:
    return np.pad(img, ((0, H - img.shape[0]), (0, W - img.shape[1])),
                  mode="edge")


def extract_features(images: Sequence[np.ndarray],
                     cfg: Config,
                     progress: Optional[Callable[[float], None]] = None,
                     cancelled: Optional[Callable[[], bool]] = None,
                     ) -> List[Features]:
    """Extract SIFT features for a list of BGR uint8 images.

    Every image is padded (edge-replicate) to the common max shape rounded
    to a multiple of 8, so one compiled program serves all of them.
    ``progress`` receives a per-image fraction delta; ``cancelled`` is
    polled between images (the reference polls its atomic between async
    tasks, _image.cpp:130).
    """
    if not images:
        return []
    if cancelled is not None and cancelled():
        raise RuntimeError("Process canceled")
    K = cfg.sift_max_features()
    Hm = max(im.shape[0] for im in images)
    Wm = max(im.shape[1] for im in images)
    Hp = (Hm + 7) // 8 * 8
    Wp = (Wm + 7) // 8 * 8

    n = len(images)
    # mesh-aware batch: pad the image axis to the mesh size so the ONE
    # compiled program shards data-parallel over devices (the TPU
    # equivalent of the reference's one-async-task-per-image fan-out,
    # _image.cpp:125-149 — SURVEY §2.7)
    from simplepanorama_tpu.parallel.mesh import (pipeline_mesh,
                                                  pad_leading,
                                                  shard_leading)
    mesh = pipeline_mesh()
    nb = pad_leading(n, mesh.size) if mesh is not None else n
    batch = np.zeros((nb, Hp, Wp, 3), np.uint8)
    hw = np.ones((nb, 2), np.int32) * 8   # padded slots: tiny valid area
    for i, im in enumerate(images):
        h, w = im.shape[:2]
        batch[i] = np.pad(im, ((0, Hp - h), (0, Wp - w), (0, 0)),
                          mode="edge")
        hw[i] = (h, w)

    batch_d, hw_d = jnp.asarray(batch), jnp.asarray(hw)
    if mesh is not None:
        batch_d, hw_d = shard_leading((batch_d, hw_d), mesh)

    fb = extract_sift_batch(
        batch_d, hw_d,
        max_kp=K,
        n_layers=cfg.nOctaveLayers,
        contrast_thresh=float(cfg.contrastThreshold),
        edge_thresh=float(cfg.edgeThreshold),
        sigma=float(cfg.sigma_sift))
    xy_all = np.array(fb.xy)
    size_all = np.asarray(fb.size)
    resp_all = np.asarray(fb.response)
    desc_all = np.asarray(fb.desc)
    valid_all = np.asarray(fb.valid)

    out: List[Features] = []
    for i, im in enumerate(images):
        h, w = im.shape[:2]
        xy = xy_all[i]
        # center-origin shift with integer halves (reference convention)
        xy[:, 0] -= w // 2
        xy[:, 1] -= h // 2
        xy[~valid_all[i]] = 0.0
        out.append(Features(xy=xy, size=size_all[i], response=resp_all[i],
                            desc=desc_all[i], valid=valid_all[i]))
        if progress is not None:
            progress(1.0 / n)
    return out
