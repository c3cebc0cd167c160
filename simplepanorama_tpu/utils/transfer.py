"""Device->host canvas transfer tuned for a network-attached device.

The tunnel link sustains ~18 MB/s on a single blocking fetch but
aggregates to ~48 MB/s with 8 concurrent in-flight transfers (measured
on the 23 MB FKH360 preview canvas: 1.4 s -> 0.48 s), so large canvases
are pulled as column slabs by a small thread pool. Small arrays take
the plain path — slab setup costs a device-side copy per slab.
"""

from __future__ import annotations

import threading

import numpy as np
import jax

_SLAB_THREADS = 8


def fetch_slabs(arr, nthreads: int = _SLAB_THREADS) -> np.ndarray:
    """Fetch a device (H, W, ...) canvas as concurrently-pulled column
    slabs. Byte-identical to ``np.asarray(arr)``."""
    H, W = arr.shape[:2]
    if W < 1024 or nthreads <= 1:
        return np.asarray(arr)
    cuts = [W * i // nthreads for i in range(nthreads + 1)]
    slabs = [arr[:, cuts[i]:cuts[i + 1]] for i in range(nthreads)]
    jax.block_until_ready(slabs)
    out = np.empty(arr.shape, arr.dtype)

    def get(i):
        out[:, cuts[i]:cuts[i + 1]] = np.asarray(slabs[i])

    threads = [threading.Thread(target=get, args=(i,))
               for i in range(nthreads)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    return out
