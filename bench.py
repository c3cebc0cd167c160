"""Benchmark: end-to-end stitch throughput on the bundled `map` sequence.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.

The reference publishes no numbers (BASELINE.md); the north-star metric is
images stitched per second per chip at the reference's working resolution
(init_size=700, RANSAC 1500, LM<=50 — the reference's own algorithmic
budgets). vs_baseline is reported against the first recorded value in
bench_baseline.json (created on first run), so round-over-round progress
is visible even without a published reference number.
"""

import glob
import json
import os
import pathlib
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/spt_jax_cache")


def run_once(paths, cfg):
    from simplepanorama_tpu.pipeline import Panorama
    t0 = time.time()
    p = Panorama(paths)
    p.stitch(cfg)
    p.get_preview()
    return time.time() - t0, p.connected


def main():
    import jax
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/spt_jax_cache")
    except Exception:
        pass
    from simplepanorama_tpu.config import Config

    paths = sorted(glob.glob("/root/reference/results/map/budapest*.jpg"))
    cfg = Config()  # reference defaults: init_size=700, 1500 RANSAC iters

    # warm-up run populates jit caches; timed run measures steady state
    run_once(paths, cfg)
    dt, connected = run_once(paths, cfg)
    n = connected[0]
    value = n / dt

    baseline_file = pathlib.Path(__file__).parent / "bench_baseline.json"
    if baseline_file.exists():
        base = json.loads(baseline_file.read_text())["value"]
    else:
        base = value
        baseline_file.write_text(json.dumps({"value": value}))
    print(json.dumps({
        "metric": "map_stitch_images_per_s",
        "value": round(value, 4),
        "unit": "images/s",
        "vs_baseline": round(value / base, 3),
    }))


if __name__ == "__main__":
    main()
