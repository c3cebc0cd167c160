"""Distribution layer: device meshes, sharded pairwise matching, and the
distributed bundle-adjustment step (SURVEY §2.7/§5 — the reference has no
communication backend; std::thread/OpenMP fan-outs map to sharded device
axes with XLA collectives)."""

from simplepanorama_tpu.parallel.mesh import make_mesh, shard_matches
from simplepanorama_tpu.parallel.dist_ba import lm_run_sharded

__all__ = ["make_mesh", "shard_matches", "lm_run_sharded"]
