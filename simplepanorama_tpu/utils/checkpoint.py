"""Checkpoint/resume: serialize the post-BA stitch state.

The reference has no checkpointing (SURVEY §5); its nearest analogs are
the memoized full panorama and incremental image loading. The rebuild
serializes StitchResult (rot/K/adjacency/order/center/sizes/nodes) so
compositing — including full-resolution re-renders with different
blend/seam/projection settings — can resume without re-running features,
matching, or bundle adjustment.
"""

from __future__ import annotations

import json
import pathlib
from typing import Union

import numpy as np


def save_stitch_state(path: Union[str, pathlib.Path], res,
                      paths=None) -> None:
    """Write a StitchResult to an .npz (+ JSON metadata inside).
    ``paths``: the source image list (res.nodes indexes into it), stored
    so a resume needs no external bookkeeping."""
    meta = {
        "order": res.order,
        "nodes": res.nodes,
        "center": res.center,
        "sizes": res.sizes,
        "paths": list(paths) if paths is not None else None,
        "version": 1,
    }
    np.savez_compressed(
        str(path),
        rot=res.rot, K=res.K, adj=res.adj,
        connectivity=res.connectivity,
        meta=json.dumps(meta))


def load_stitch_state(path: Union[str, pathlib.Path], with_paths=False):
    from simplepanorama_tpu.stitch import StitchResult
    z = np.load(str(path), allow_pickle=False)
    meta = json.loads(str(z["meta"]))
    res = StitchResult(
        rot=z["rot"], K=z["K"], adj=z["adj"],
        connectivity=z["connectivity"],
        order=[tuple(p) for p in meta["order"]],
        nodes=list(meta["nodes"]),
        center=int(meta["center"]),
        sizes=[tuple(s) for s in meta["sizes"]])
    if with_paths:
        return res, meta.get("paths")
    return res
