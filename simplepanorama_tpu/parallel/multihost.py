"""Multi-host distribution over DCN.

The reference has no distributed backend (SURVEY §5); scaling past one
host here rides jax.distributed + the same collectives as the single-host
mesh — the ICI mesh axes simply extend across hosts and XLA routes the
psum/all-gather legs over DCN.

Workload split on a multi-host mesh:
  * image decode + feature batches: per-host shards of the image list
    (each host feeds its local devices; process_index selects the shard);
  * pair verification: the (i, j) work list is embarrassingly parallel —
    sharded across all devices globally;
  * BA: match tables sharded globally, the 6Nx6N camera system reduced
    with one psum (cheap on DCN: N cameras, 36N^2 floats);
  * compositing: canvas tiles per host, halo exchange via ppermute.

CI cannot run true multi-host; these helpers are exercised in
single-process mode and by the driver's virtual-device dry run.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import numpy as np
import jax
from jax.sharding import Mesh


def initialize(coordinator: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """jax.distributed.initialize with env-var fallbacks
    (SPT_COORDINATOR, SPT_NUM_PROCS, SPT_PROC_ID)."""
    coordinator = coordinator or os.environ.get("SPT_COORDINATOR")
    if coordinator is None:
        return  # single-process
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes or int(os.environ["SPT_NUM_PROCS"]),
        process_id=process_id if process_id is not None
        else int(os.environ["SPT_PROC_ID"]))


def global_mesh(axis: str = "data") -> Mesh:
    """1-D mesh over every device of every process."""
    return Mesh(np.array(jax.devices()), (axis,))


def host_shard(items: Sequence, n: Optional[int] = None,
               idx: Optional[int] = None) -> list:
    """This host's contiguous shard of a work list (images to decode,
    pairs to verify)."""
    n = n if n is not None else jax.process_count()
    idx = idx if idx is not None else jax.process_index()
    per = (len(items) + n - 1) // n
    return list(items[idx * per:(idx + 1) * per])
