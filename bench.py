"""Benchmark: end-to-end stitch throughput on the bundled `map` sequence,
plus the BASELINE.md north-star metrics.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"} (the
driver contract). A sidecar `bench_breakdown.json` records:
  * per-stage wall times of the timed stitch (load/keypoints/matching/
    bundle_adjust/compositing/render_preview);
  * BA LM iters/s at production problem size (relaxed objective);
  * graph-cut seam solve at a production 500x700 overlap ROI: the JAX
    push-relabel kernel vs the native Dinic host oracle (the reference's
    BK max-flow slot — its README calls graph-cut "can be very slow",
    README.md:154; this is where the TPU rebuild must win);
  * scaling efficiency over the attached mesh when >1 device is present.

The reference publishes no numbers (BASELINE.md); vs_baseline is against
the first recorded value in bench_baseline.json.
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


def bench_lm_iters():
    """BA LM iters/s: relaxed objective, production-scale padded problem
    (N=16 cameras, M=4096 matches — a 14-image sequence's capacity)."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from simplepanorama_tpu import ba
    rng = np.random.default_rng(0)
    N, M = 16, 4096
    mi = rng.integers(0, N - 1, M).astype(np.int32)
    data = ba.BAData(
        mi=jnp.asarray(mi), mj=jnp.asarray((mi + 1).astype(np.int32)),
        q=jnp.asarray(rng.uniform(-300, 300, (M, 2)).astype(np.float32)),
        t=jnp.asarray(rng.uniform(-300, 300, (M, 2)).astype(np.float32)),
        m_valid=jnp.ones(M, bool))
    cams = ba.CamState(
        focal=jnp.full((N,), 700.0), ppal=jnp.zeros((N, 2)),
        rotvec=jnp.asarray(
            rng.normal(0, 0.05, (N, 3)).astype(np.float32)).at[0].set(0.0),
        b=data.t)
    active = jnp.ones(N, bool)
    res = ba.lm_run(cams, data, active, 0.05, fast=False, max_iter=50)
    jax.block_until_ready(res)          # compile
    t0 = time.time()
    res = ba.lm_run(cams, data, active, 0.05, fast=False, max_iter=50)
    jax.block_until_ready(res)
    dt = time.time() - t0
    return {"n_iter": int(res.n_iter), "seconds": round(dt, 4),
            "lm_iters_per_s": round(int(res.n_iter) / dt, 2),
            "n_cams": N, "n_matches": M}


def bench_mincut():
    """Production seam cut: 500x700 overlap graph built from real image
    content; JAX push-relabel vs the native Dinic oracle (cut values must
    agree — they are both exact min cuts)."""
    import numpy as np
    import cv2
    import jax
    import jax.numpy as jnp
    from simplepanorama_tpu.render.graphcut import _build_cut_graph
    from simplepanorama_tpu.ops.maxflow import grid_mincut_auto as \
        grid_mincut
    img = cv2.imread("/root/reference/results/map/budapest1.jpg")
    img = cv2.resize(img, (1400, 1000))
    g = (0.114 * img[..., 0] + 0.587 * img[..., 1]
         + 0.299 * img[..., 2]).astype(np.float32)
    H, W, dy, dx = 500, 700, 40, 180
    m1 = np.zeros((H, W), np.float32)
    m1[2:H - 2, 2:int(W * 0.60)] = 255.0
    m2 = np.zeros((H, W), np.float32)
    m2[2:H - 2, int(W * 0.35):W - 2] = 255.0
    graph = _build_cut_graph(jnp.asarray(g[:H, :W]),
                             jnp.asarray(g[dy:dy + H, dx:dx + W]),
                             jnp.asarray(m1), jnp.asarray(m2))
    side = grid_mincut(*graph)
    jax.block_until_ready(side)         # compile
    t0 = time.time()
    side = grid_mincut(*graph)
    jax.block_until_ready(side)
    t_dev = time.time() - t0
    out = {"grid": f"{H}x{W}", "device_seconds": round(t_dev, 4),
           "mpix_per_s": round(H * W / t_dev / 1e6, 3)}
    try:
        from simplepanorama_tpu.native import grid_mincut_native
        wh, wv, exc, obj = (np.asarray(a) for a in graph)
        t0 = time.time()
        grid_mincut_native(wh, wv, exc, obj)
        out["dinic_host_seconds"] = round(time.time() - t0, 4)
        out["speedup_vs_host_dinic"] = round(
            out["dinic_host_seconds"] / t_dev, 2)
    except Exception as e:              # native toolchain unavailable
        out["dinic_host_seconds"] = None
        out["dinic_error"] = str(e)
    return out


def main():
    import jax
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/spt_jax_cache")
    except Exception:
        pass
    from simplepanorama_tpu.config import Config
    from simplepanorama_tpu.utils.timing import global_timer

    paths = sorted(glob.glob("/root/reference/results/map/budapest*.jpg"))
    cfg = Config()  # reference defaults: init_size=700, 1500 RANSAC iters

    # warm-up run populates jit caches; best of three timed runs measures
    # steady state (the device link is a network tunnel here — single-run
    # wall times vary ~15% with link jitter)
    run_once(paths, cfg)
    timer = global_timer()
    dt = float("inf")
    for _ in range(3):
        timer.durations.clear()
        timer.counts.clear()
        d, connected = run_once(paths, cfg)
        if d < dt:
            dt = d
            stages = dict(timer.durations)
    n = connected[0]
    value = n / dt

    breakdown = {
        "map_stitch": {
            "images": n, "seconds": round(dt, 3),
            "images_per_s": round(value, 4),
            "stages_s": {k: round(v, 3)
                         for k, v in sorted(stages.items(),
                                            key=lambda kv: -kv[1])},
        },
        "ba_lm": bench_lm_iters(),
        "graph_cut_seam": bench_mincut(),
        "backend": jax.default_backend(),
        "n_devices": jax.device_count(),
    }

    if jax.device_count() > 1:
        # scaling sanity over the attached mesh: the sharded LM step vs
        # single-device (wall-clock meaningful only on real multi-chip)
        from simplepanorama_tpu.parallel.mesh import make_mesh
        from simplepanorama_tpu.parallel import lm_run_shard_map
        import jax.numpy as jnp
        from simplepanorama_tpu import ba as _ba
        import numpy as _np
        rng = _np.random.default_rng(0)
        N, M = 16, 4096 * jax.device_count()
        mi = rng.integers(0, N - 1, M).astype(_np.int32)
        data = _ba.BAData(
            mi=jnp.asarray(mi), mj=jnp.asarray((mi + 1).astype(_np.int32)),
            q=jnp.asarray(rng.uniform(-300, 300, (M, 2)).astype(_np.float32)),
            t=jnp.asarray(rng.uniform(-300, 300, (M, 2)).astype(_np.float32)),
            m_valid=jnp.ones(M, bool))
        cams = _ba.CamState(
            focal=jnp.full((N,), 700.0), ppal=jnp.zeros((N, 2)),
            rotvec=jnp.asarray(rng.normal(0, 0.05, (N, 3))
                               .astype(_np.float32)).at[0].set(0.0),
            b=data.t)
        active = jnp.ones(N, bool)
        mesh = make_mesh()
        res = lm_run_shard_map(cams, data, active, 0.05, mesh, fast=False,
                               max_iter=20)
        jax.block_until_ready(res)
        t0 = time.time()
        res = lm_run_shard_map(cams, data, active, 0.05, mesh, fast=False,
                               max_iter=20)
        jax.block_until_ready(res)
        breakdown["sharded_lm"] = {
            "devices": jax.device_count(),
            "matches": M, "seconds": round(time.time() - t0, 4),
            "iters": int(res.n_iter)}

    root = pathlib.Path(__file__).parent
    (root / "bench_breakdown.json").write_text(
        json.dumps(breakdown, indent=1))

    baseline_file = root / "bench_baseline.json"
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
