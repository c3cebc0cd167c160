"""Distributed bundle adjustment: LM over a device mesh.

The Schur trick is what makes this distribution cheap (SURVEY §5): per-match
V blocks are 2x2 and local to the shard holding the match; only the 6Nx6N
reduced camera system is global. Matches are sharded across the mesh axis;
each device computes its partial U = sum A^T A, e_A = sum A^T r,
sum Y W^T, sum Y e_B over local matches; psums produce the global camera
system, which every device solves redundantly (tiny); the per-match
back-substitution d_b = V*^{-1}(e_B - W^T d_a) stays local. This is the
reference's get_iter_par async dataflow
(/root/reference/src/math/_bundle_adjust_main.cpp:192-244) reborn as a
collective schedule.

Two interchangeable implementations:
  * ``lm_run_sharded`` — jit with sharding annotations; XLA's SPMD
    partitioner inserts the all-reduces (the idiomatic path, identical
    numerics to ba.lm_run);
  * ``lm_run_shard_map`` — the SAME LM loop (ba.lm_run_impl) under
    shard_map with explicit lax.psum collectives, supporting BOTH
    objectives: fast/Lowe (camera-only) and the relaxed default with
    local delta_b back-substitution and the full lambda schedule
    (_bundle_adjust_main.cpp:346-413, 456-510).

``make_lm_step_shard_map`` exposes one LM trial step of the same program
(for callers that drive the schedule themselves).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from simplepanorama_tpu import ba


def _specs(axis: str, has_pairs: bool = False):
    sharded, rep = P(axis), P()
    data_specs = ba.BAData(mi=sharded, mj=sharded, q=sharded, t=sharded,
                           m_valid=sharded,
                           # realized-pair tables: tiny, replicated; mp
                           # rides the match axis (None when absent so
                           # the spec pytree matches the data pytree)
                           pi=rep if has_pairs else None,
                           pj=rep if has_pairs else None,
                           mp=sharded if has_pairs else None)
    cam_specs = ba.CamState(focal=rep, ppal=rep, rotvec=rep, b=sharded)
    return data_specs, cam_specs, rep


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
    put_m = lambda x: jax.device_put(x, msh) if x is not None else None
    data_s = ba.BAData(mi=put_m(data.mi), mj=put_m(data.mj),
                       q=put_m(data.q), t=put_m(data.t),
                       m_valid=put_m(data.m_valid),
                       pi=None if data.pi is None
                       else jax.device_put(data.pi, rep),
                       pj=None if data.pj is None
                       else jax.device_put(data.pj, rep),
                       mp=put_m(data.mp))
    cams_r = jax.tree.map(lambda x: jax.device_put(x, rep), cams)
    # b rides the match axis: shard it like the data
    cams_r = cams_r._replace(b=jax.device_put(cams.b, msh))
    active_r = jax.device_put(cam_active, rep)
    return ba.lm_run(cams_r, data_s, active_r, lambda0, fast=fast,
                     max_iter=max_iter)


def lm_run_shard_map(cams: ba.CamState, data: ba.BAData,
                     cam_active: jnp.ndarray, lambda0,
                     mesh: Mesh, axis: str = "data",
                     fast: bool = False, max_iter: int = 50) -> ba.LMResult:
    """The full LM loop (lambda x/÷10 schedule, 6-strike stop) as ONE
    shard_map program with explicit psum collectives, for either
    objective. Match tables and cams.b must be shardable by ``axis``
    (pad M to a multiple of the axis size)."""
    data_specs, cam_specs, rep = _specs(axis, data.pi is not None)
    out_specs = ba.LMResult(cams=cam_specs, error=rep, lam=rep,
                            n_accepted=rep, n_iter=rep)
    body = functools.partial(ba.lm_run_impl, fast=fast, max_iter=max_iter,
                             psum_axis=axis)
    f = shard_map(body, mesh=mesh,
                  in_specs=(cam_specs, data_specs, rep, rep),
                  out_specs=out_specs)
    return jax.jit(f)(cams, data, cam_active,
                      jnp.asarray(lambda0, jnp.float32))


def make_lm_step_shard_map(mesh: Mesh, n_cams: int, axis: str = "data",
                           fast: bool = False):
    """One explicit-collective LM trial step over locally-sharded match
    tables (same math as lm_run_shard_map's loop body, without the
    schedule). Returns step(cams, local_data, cam_active, lam) ->
    (new_cams, err, ok) to be called under shard_map/jit with the match
    tables pre-split."""

    def step(cams: ba.CamState, data: ba.BAData, cam_active, lam):
        N = n_cams
        active_m = data.m_valid & cam_active[data.mi] & cam_active[data.mj]
        S, rhs, Vinv, W, eB = ba._assemble(
            cams, data, active_m, lam, cam_active, fast, N, psum_axis=axis)
        da = ba._solve_preconditioned(S, rhs)       # replicated tiny solve
        if fast:
            db = None
        else:
            wtd = (W * da[None, :, None]).sum(1)
            db = (Vinv * (eB - wtd)[:, None, :]).sum(2)     # local
        trial = ba._apply_delta(cams, da, db, data, cam_active,
                                active_m, fast)
        err = ba.total_error(cams, data, active_m, fast, psum_axis=axis)
        err_new = ba.total_error(trial, data, active_m, fast,
                                 psum_axis=axis)
        ok = (err_new < err) & jnp.isfinite(err_new)
        new = jax.tree.map(lambda a, b_: jnp.where(ok, a, b_), trial, cams)
        return new, err_new, ok

    return step
