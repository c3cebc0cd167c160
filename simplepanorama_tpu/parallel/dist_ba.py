"""Distributed bundle adjustment: LM over a device mesh.

The Schur trick is what makes this distribution cheap (SURVEY §5): per-match
V blocks are 2x2 and local to the shard holding the match; only the 6Nx6N
reduced camera system is global. Matches are sharded across the mesh axis;
each device computes its partial U = sum A^T A, e_A = sum A^T r,
sum Y W^T, sum Y e_B over local matches; one psum produces the global
camera system, which every device solves redundantly (tiny); the per-match
back-substitution d_b = V*^{-1}(e_B - W^T d_a) stays local.

Two interchangeable implementations:
  * ``lm_run_sharded`` — jit with sharding annotations; XLA's SPMD
    partitioner inserts the all-reduces (the idiomatic path, identical
    numerics to ba.lm_run);
  * ``lm_step_shard_map`` — explicit shard_map + lax.psum, spelling out
    the collective schedule (the reference's get_iter_par async dataflow,
    _bundle_adjust_main.cpp:192-244, reborn as one collective).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from simplepanorama_tpu import ba


def lm_run_sharded(cams: ba.CamState, data: ba.BAData,
                   cam_active: jnp.ndarray, lambda0,
                   mesh: Mesh, axis: str = "data",
                   fast: bool = False, max_iter: int = 50) -> ba.LMResult:
    """ba.lm_run with the match axis sharded over ``mesh``.

    The camera state is replicated; XLA partitions the vmapped Jacobians
    and turns the segment-sums into psum collectives automatically.
    """
    msh = NamedSharding(mesh, P(axis))
    rep = NamedSharding(mesh, P())
    data_s = jax.tree.map(lambda x: jax.device_put(x, msh), data)
    cams_r = jax.tree.map(lambda x: jax.device_put(x, rep), cams)
    # b rides the match axis: shard it like the data
    cams_r = cams_r._replace(b=jax.device_put(cams.b, msh))
    active_r = jax.device_put(cam_active, rep)
    return ba.lm_run(cams_r, data_s, active_r, lambda0, fast=fast,
                     max_iter=max_iter)


def make_lm_step_shard_map(mesh: Mesh, n_cams: int, axis: str = "data",
                           fast: bool = False):
    """Explicit-collective LM trial step over locally-sharded match tables.

    Returns step(cams, local_data, cam_active, lam) -> (new_cams, err, ok)
    to be called under shard_map/jit with the match tables pre-split.
    """

    def step(cams: ba.CamState, data: ba.BAData, cam_active, lam):
        N = n_cams
        active_m = data.m_valid & cam_active[data.mi] & cam_active[data.mj]
        c6 = ba._cam6(cams)
        b = data.t if fast else cams.b
        Ai, Aj, B = jax.vmap(ba._res_jac)(c6[data.mi], c6[data.mj], b,
                                          data.q, data.t)
        r = jax.vmap(ba._match_residual)(c6[data.mi], c6[data.mj], b,
                                         data.q, data.t)
        msk = active_m[:, None, None]
        Ai = jnp.where(msk, Ai, 0.0)
        Aj = jnp.where(msk, Aj, 0.0)
        B = jnp.where(msk, B, 0.0)
        r = jnp.where(active_m[:, None], r, 0.0)

        seg = jnp.concatenate([data.mi * N + data.mi, data.mj * N + data.mj,
                               data.mi * N + data.mj, data.mj * N + data.mi])
        blocks = jnp.concatenate([
            jnp.einsum("mab,mac->mbc", Ai, Ai),
            jnp.einsum("mab,mac->mbc", Aj, Aj),
            jnp.einsum("mab,mac->mbc", Ai, Aj),
            jnp.einsum("mab,mac->mbc", Aj, Ai)])
        U = jax.ops.segment_sum(blocks, seg, num_segments=N * N)
        eA = -(jax.ops.segment_sum(jnp.einsum("mab,ma->mb", Ai, r), data.mi,
                                   num_segments=N)
               + jax.ops.segment_sum(jnp.einsum("mab,ma->mb", Aj, r),
                                     data.mj, num_segments=N))
        err_local = jnp.sum(jnp.linalg.norm(r, axis=-1))

        # THE collective: partial normal equations -> global camera system
        U = jax.lax.psum(U, axis)
        eA = jax.lax.psum(eA, axis)
        err = jax.lax.psum(err_local, axis)

        U = U.reshape(N, N, 6, 6).transpose(0, 2, 1, 3).reshape(6 * N, 6 * N)
        aug = jnp.concatenate([
            jnp.repeat(cams.focal[:, None] * ba._AUG_FOCAL, 3, axis=1),
            jnp.full((N, 3), ba._AUG_ANG)], axis=1).reshape(-1)
        S = U + jnp.diag(jnp.diag(U) * lam * aug)
        act6 = jnp.repeat(cam_active, 6)
        S = jnp.where(act6[:, None] & act6[None, :], S, 0.0)
        S = S + jnp.diag(jnp.where(act6, 0.0, 1.0))
        rhs = jnp.where(act6, eA.reshape(-1), 0.0)
        da = ba._solve_preconditioned(S, rhs)       # replicated tiny solve
        trial = ba._apply_delta(cams, da, None, data, cam_active,
                                active_m, True)
        # trial error (second collective)
        r2 = ba.residuals(trial, data, active_m, fast=True)
        err_new = jax.lax.psum(jnp.sum(jnp.linalg.norm(r2, axis=-1)), axis)
        ok = (err_new < err) & jnp.isfinite(err_new)
        new = jax.tree.map(lambda a, b_: jnp.where(ok, a, b_), trial, cams)
        return new, err_new, ok

    return step
