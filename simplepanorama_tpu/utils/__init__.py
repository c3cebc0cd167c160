"""Utilities: tracing/profiling, checkpointing, thumbnails."""

from simplepanorama_tpu.utils.timing import Timer, stage
from simplepanorama_tpu.utils.checkpoint import (
    save_stitch_state, load_stitch_state)

__all__ = ["Timer", "stage", "save_stitch_state", "load_stitch_state"]
