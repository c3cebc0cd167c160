"""Two-process multi-host smoke over loopback DCN (SURVEY §7 step 8):
jax.distributed with 2 CPU processes, per-host image shards for feature
extraction, process_allgather of the feature tables, and a global-mesh
psum — the communication pattern run_pipeline's stages use across hosts."""

import os
import socket
import subprocess
import sys
import textwrap

import numpy as np
import pytest

_WORKER = textwrap.dedent("""
    import os, sys
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    import jax
    jax.config.update("jax_platforms", "cpu")
    coord, pid = sys.argv[1], int(sys.argv[2])
    jax.distributed.initialize(coordinator_address=coord,
                               num_processes=2, process_id=pid)
    assert jax.process_count() == 2
    assert jax.device_count() == 4          # 2 local x 2 processes

    import numpy as np
    import cv2
    sys.path.insert(0, "/root/repo")
    from simplepanorama_tpu.config import Config
    from simplepanorama_tpu.features import extract_features
    from simplepanorama_tpu.parallel.multihost import host_shard, global_mesh

    # every process holds the same 3-image list; extraction shards by host
    paths = sorted(__import__("glob").glob(
        "/root/reference/results/map/budapest*.jpg"))[:3]
    from simplepanorama_tpu.io import clamp_to_init_size
    imgs = [clamp_to_init_size(cv2.imread(p), 300) for p in paths]
    cfg = Config()
    assert host_shard(list(range(3))) == ([0, 1] if pid == 0 else [2])
    feats = extract_features(imgs, cfg)
    assert len(feats) == 3
    counts = [f.count for f in feats]
    assert all(c > 50 for c in counts), counts

    # a psum over the global 4-device mesh rides loopback DCN
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P
    from jax.experimental import multihost_utils
    mesh = global_mesh()
    x = multihost_utils.host_local_array_to_global_array(
        np.ones((4, 8), np.float32) * (pid + 1), mesh, P("data"))
    from jax import shard_map
    s = shard_map(lambda v: jax.lax.psum(jnp.sum(v), "data"), mesh=mesh,
                  in_specs=P("data"), out_specs=P())
    total = jax.jit(s)(x)
    # global array: proc0 rows (value 1) + proc1 rows (value 2)
    assert abs(float(total) - (4*8*1.0 + 4*8*2.0)) < 1e-3, float(total)

    print(f"proc {pid}: ok counts={counts} psum={float(total)}", flush=True)
""")


@pytest.mark.slow
def test_two_process_feature_shard_and_psum(tmp_path):
    if os.environ.get("SPT_TEST_PLATFORM", "cpu") != "cpu":
        pytest.skip("multi-process smoke runs on the CPU backend")
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    coord = f"127.0.0.1:{port}"
    script = tmp_path / "worker.py"
    script.write_text(_WORKER)
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env["PALLAS_AXON_POOL_IPS"] = ""
    procs = [subprocess.Popen(
        [sys.executable, str(script), coord, str(i)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        env=env) for i in range(2)]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=600)
            outs.append(out)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.fail("multi-process smoke timed out")
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out[-3000:]}"
        assert f"proc {i}: ok" in out
