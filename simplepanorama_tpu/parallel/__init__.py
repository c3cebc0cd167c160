"""Distribution layer: device meshes, sharded pairwise matching, and the
distributed bundle-adjustment step (SURVEY §2.7/§5 — the reference has no
communication backend; std::thread/OpenMP fan-outs map to sharded device
axes with XLA collectives)."""

from simplepanorama_tpu.parallel.mesh import make_mesh, shard_matches
from simplepanorama_tpu.parallel.dist_ba import (lm_run_sharded,
                                                 lm_run_shard_map)

__all__ = ["make_mesh", "shard_matches", "lm_run_sharded",
           "lm_run_shard_map",
           "multi_blend_sharded", "warp_tiled", "halo_exchange",
           "grid_mincut_sharded"]


def __getattr__(name):
    # lazy: tiled_compose/dist_mincut pull in the render stack
    if name in ("multi_blend_sharded", "warp_tiled", "halo_exchange"):
        from simplepanorama_tpu.parallel import tiled_compose
        return getattr(tiled_compose, name)
    if name == "grid_mincut_sharded":
        from simplepanorama_tpu.parallel import dist_mincut
        return dist_mincut.grid_mincut_sharded
    raise AttributeError(name)
