"""Host-side image I/O: decode, dedup, resize rules, save.

Reproduces the behavior of ``img::images`` (/root/reference/src/classes/
_image.cpp): path dedup on add, lazy resized loading with a minimum-size
check (both sides >= 300 px) and a max-side clamp to ``init_size``
(_image.cpp:29-73), and full-res reloading of only the connected images
(_image.cpp:76-91).

Decoding runs on the host (cv2 imdecode) with a thread pool — the TPU path
starts after decode. Images are kept BGR uint8 (reference convention) on the
host; device code converts to float32 planes.
"""

from __future__ import annotations

import concurrent.futures
from pathlib import Path
from typing import List, Optional, Sequence

import cv2
import numpy as np


class ImageTooSmallError(RuntimeError):
    """Raised for inputs under the 300-px minimum (_image.cpp:45-49)."""


def file_to_array(path: str) -> Optional[np.ndarray]:
    """Binary read + imdecode (imgm::file_to_cv, _img_manipulation.cpp:148-174).

    Returns BGR uint8 (H, W, 3) or None on failure.
    """
    try:
        buf = np.fromfile(path, dtype=np.uint8)
    except OSError:
        return None
    if buf.size == 0:
        return None
    img = cv2.imdecode(buf, cv2.IMREAD_COLOR)
    return img


def resize_keep_aspect(img: np.ndarray, desired_width: int) -> np.ndarray:
    """Resize to a target width preserving aspect ratio
    (imgm::resizeKeepAspectRatio, _img_manipulation.cpp:116-145):
    INTER_AREA when shrinking, INTER_LINEAR when enlarging."""
    h, w = img.shape[:2]
    scale = desired_width / w
    desired_height = int(round(h * scale))
    interp = cv2.INTER_LINEAR if desired_width > w else cv2.INTER_AREA
    return cv2.resize(img, (desired_width, desired_height), interpolation=interp)


def clamp_to_init_size(img: np.ndarray, max_size: int) -> np.ndarray:
    """Apply the reference's working-resolution rule (_image.cpp:45-67):
    reject tiny images, clamp the max side to ``max_size``."""
    h, w = img.shape[:2]
    if h < 300 or w < 300 or max_size < 300:
        raise ImageTooSmallError(
            "Error: Image size too small (img.width < 300 or img.height < 300)")
    if max(h, w) > max_size:
        if w >= h:
            return resize_keep_aspect(img, max_size)
        # portrait: scale so the *height* becomes max_size
        # (reference computes the new width = max_size * w / h and resizes
        # keeping aspect, _image.cpp:60-64)
        new_w = int((max_size * w) / h)
        return resize_keep_aspect(img, new_w)
    return img


class ImageSet:
    """The image collection: dedup'd paths, lazily decoded working-resolution
    images, and full-res reload of connected images only."""

    def __init__(self, paths: Sequence[str] = ()):  # noqa: D401
        self.f_list: List[str] = []
        self.loaded: List[str] = []
        self.img_data: List[np.ndarray] = []
        self.add_images(paths)

    def add_images(self, paths: Sequence[str]) -> None:
        """Dedup against the current list (images::add_images, _image.cpp:14-26)."""
        for p in paths:
            p = str(p)
            if p not in self.f_list:
                self.f_list.append(p)

    def __len__(self) -> int:
        return len(self.f_list)

    def load_resized(self, max_size: int, threads: int = 8) -> None:
        """Decode (threaded) any not-yet-loaded paths at working resolution."""
        todo = [p for p in self.f_list if p not in set(self.loaded)]
        if not todo:
            return

        def _load(p: str) -> np.ndarray:
            img = file_to_array(p)
            if img is None:
                raise RuntimeError(f"Error: Image decoding failed: {p}")
            return clamp_to_init_size(img, max_size)

        with concurrent.futures.ThreadPoolExecutor(max_workers=max(1, threads)) as ex:
            results = list(ex.map(_load, todo))
        for p, img in zip(todo, results):
            self.loaded.append(p)
            self.img_data.append(img)

    def load_connected_images(self, connected: Sequence[bool],
                              threads: int = 8) -> List[Optional[np.ndarray]]:
        """Full-res decode of only the connected images
        (images::load_connected_images, _image.cpp:76-91)."""
        def _load(args):
            p, use = args
            return file_to_array(p) if use else None

        with concurrent.futures.ThreadPoolExecutor(max_workers=max(1, threads)) as ex:
            return list(ex.map(_load, zip(self.loaded, connected)))

    def clear_images(self) -> None:
        self.img_data = []
        self.loaded = []


def save_image(path: str, img: np.ndarray) -> bool:
    """imwrite wrapper (PNG/JPEG by extension, like the viewer's Save)."""
    Path(path).parent.mkdir(parents=True, exist_ok=True)
    return bool(cv2.imwrite(str(path), img))


def resize_to_thumbnail(img: np.ndarray, size: int = 250) -> np.ndarray:
    """Pad-to-square thumbnail (imgm::resize_image,
    /root/reference/src/math/_img_manipulation.cpp:87-113): scale the long
    side to ``size``, pad the short side symmetrically with black."""
    h, w = img.shape[:2]
    scale = size / max(h, w)
    nh, nw = max(1, int(round(h * scale))), max(1, int(round(w * scale)))
    small = cv2.resize(img, (nw, nh), interpolation=cv2.INTER_AREA)
    top = (size - nh) // 2
    left = (size - nw) // 2
    out = np.zeros((size, size) + img.shape[2:], img.dtype)
    out[top:top + nh, left:left + nw] = small
    return out


def cylinder_prewarp(img: np.ndarray, focal: float,
                     center: Optional[tuple] = None) -> np.ndarray:
    """Legacy cylindrical pre-warp (images::images_to_cylinder ->
    imgm::project, /root/reference/src/classes/_image.cpp:168-191):
    inverse-map each output pixel through x = f*tan((u-cx)/f),
    y = (v-cy)*sqrt(x^2+f^2)/f around the image center."""
    h, w = img.shape[:2]
    cx = w / 2 if center is None else center[0]
    cy = h / 2 if center is None else center[1]
    u, v = np.meshgrid(np.arange(w, dtype=np.float32),
                       np.arange(h, dtype=np.float32))
    theta = (u - cx) / focal
    x = focal * np.tan(theta)
    y = (v - cy) * np.sqrt(x * x + focal * focal) / focal
    map_x = (x + cx).astype(np.float32)
    map_y = (y + cy).astype(np.float32)
    return cv2.remap(img, map_x, map_y, cv2.INTER_LINEAR,
                     borderMode=cv2.BORDER_CONSTANT)
