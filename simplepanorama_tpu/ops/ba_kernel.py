"""Fused normal-equation accumulation for bundle adjustment (TPU).

One LM iteration's heavy section builds, from per-match Jacobian blocks,
the camera-space accumulations

    U   = sum_m J_m^T J_m            (6N, 6N)
    eA  = sum_m J_m^T r_m            (6N,)
    YW  = sum_m W_m V_m^-1 W_m^T     (6N, 6N),  W_m = J_m^T B_m
    yeb = sum_m W_m (V_m^-1 eB_m)    (6N,)

The XLA formulation materializes the block-sparse J (M, 2, 6N) and
W (M, 6N, 2) in HBM and reads them back for every contraction — ~15
passes over ~40 MB arrays per iteration at production capacity
(N=36, M~20k). This Pallas kernel streams the per-match blocks
(M x ~40 floats total) through VMEM once, builds the J/W/Z tiles
on-chip (everything strictly 2-D for Mosaic: the 6->6N tile via
pltpu.repeat, camera masks via 2-D iota compare), and accumulates all
four outputs in VMEM scratch across the match-block grid: HBM traffic
drops from ~600 MB to ~4 MB per call.

Inputs are the SMALL per-match tensors the chain rule produces
(ba._assemble), split into 2-D columns: Jacobian rows ai0/ai1/aj0/aj1
(M, 6), the projected-row B block as bp00/bp01/bp10/bp11 (M, 1),
projected residual rows r20/r21 (M, 1), the 2x2 Cholesky factors
l00/l10/l11 of V^-1 and g0/g1 = V^-1 eB columns (M, 1), and camera ids
mi/mj (M, 1) int32.

A pure-jnp reference implementation (`assemble_streams_ref`) defines
the semantics and serves as the CPU path and the test oracle; the
kernel is value-equivalent up to f32 summation order.

MEASURED RESULT (v5e, N=40, M=20480, fori_loop of 50): the kernel runs
2.12 ms/iter vs 1.03 ms/iter for the SAME streams in plain XLA — the
on-chip J-tile construction (pltpu.repeat of 6-wide columns + iota
masks) costs more on the VPU than the HBM traffic it saves, and XLA
already fuses the elementwise producers into the einsums well at this
size. The kernel is therefore NOT wired into ba._assemble; it is kept
as a validated building block (tests/test_ba_kernel.py) for problem
sizes where the streams dominate (M >~ 100k matches), and as the
recorded evidence for why the LM iteration's remaining cost is the
op-chain outside these streams (pair-table chains, per-match chain
rule, solve, error evaluation — see tools/ba_profile.py).

Spec reference: /root/reference/src/math/_bundle_adjust_main.cpp:270-413
(augment + get_error assemble the same U/W/V/Schur quantities with
Eigen loops).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

_BLOCK = 512
_HI = jax.lax.Precision.HIGHEST


def _tile6(x, n_cams, use_pltpu):
    """(G, 6) -> (G, 6N) as N concatenated copies (column c reads
    x[:, c % 6])."""
    if use_pltpu:
        from jax.experimental.pallas import tpu as pltpu
        return pltpu.repeat(x, n_cams, 1)
    return jnp.concatenate([x] * n_cams, axis=1)


def _stream_block(ai0, ai1, aj0, aj1, bp00, bp01, bp10, bp11, r20, r21,
                  l00, l10, l11, g0, g1, mi, mj, n_cams, with_schur,
                  use_pltpu):
    """One match-block's (U, eA, YW, yeb) contributions — shared by the
    kernel body and the reference implementation. All operands 2-D."""
    G = ai0.shape[0]
    sN = 6 * n_cams
    cam = jax.lax.broadcasted_iota(jnp.int32, (G, sN), 1) // 6
    mi_mask = (cam == mi).astype(ai0.dtype)      # mi is (G, 1)
    mj_mask = (cam == mj).astype(aj0.dtype)
    jr0 = mi_mask * _tile6(ai0, n_cams, use_pltpu) \
        + mj_mask * _tile6(aj0, n_cams, use_pltpu)
    jr1 = mi_mask * _tile6(ai1, n_cams, use_pltpu) \
        + mj_mask * _tile6(aj1, n_cams, use_pltpu)

    dot = lambda a, b: jax.lax.dot_general(
        a, b, (((0,), (0,)), ((), ())), precision=_HI,
        preferred_element_type=jnp.float32)
    U = dot(jr0, jr0) + dot(jr1, jr1)
    eA = dot(jr0, r20) + dot(jr1, r21)           # (sN, 1)
    if not with_schur:
        return (U, eA, jnp.zeros((sN, sN), jnp.float32),
                jnp.zeros((sN, 1), jnp.float32))
    w0 = jr0 * bp00 + jr1 * bp10                 # W[:, :, 0]
    w1 = jr0 * bp01 + jr1 * bp11                 # W[:, :, 1]
    z0 = w0 * l00 + w1 * l10
    z1 = w1 * l11
    YW = dot(z0, z0) + dot(z1, z1)
    yeb = dot(w0, g0) + dot(w1, g1)              # (sN, 1)
    return U, eA, YW, yeb


def _split_args(ai, aj, bp, r2, l00, l10, l11, g0, g1, mi, mj):
    """(M,2,6)/(M,2,2)/(M,2)/(M,) inputs -> strictly 2-D columns."""
    col = lambda x: x.reshape(-1, 1)
    return (ai[:, 0, :], ai[:, 1, :], aj[:, 0, :], aj[:, 1, :],
            col(bp[:, 0, 0]), col(bp[:, 0, 1]),
            col(bp[:, 1, 0]), col(bp[:, 1, 1]),
            col(r2[:, 0]), col(r2[:, 1]),
            col(l00), col(l10), col(l11), col(g0), col(g1),
            col(mi), col(mj))


def assemble_streams_ref(ai, aj, bp, r2, l00, l10, l11, g0, g1, mi, mj,
                         n_cams: int, with_schur: bool = True):
    """Reference/CPU implementation: one whole-array block."""
    U, eA, YW, yeb = _stream_block(
        *_split_args(ai, aj, bp, r2, l00, l10, l11, g0, g1, mi, mj),
        n_cams, with_schur, use_pltpu=False)
    return U, eA[:, 0], YW, yeb[:, 0]


def _kernel(*refs, n_cams, with_schur, use_pltpu):
    in_refs, out_refs = refs[:17], refs[17:]

    @pl.when(pl.program_id(0) == 0)
    def _init():
        for o in out_refs:
            o[...] = jnp.zeros_like(o)

    U, eA, YW, yeb = _stream_block(
        *(r[...] for r in in_refs), n_cams, with_schur, use_pltpu)
    out_refs[0][...] += U
    out_refs[1][...] += eA
    out_refs[2][...] += YW
    out_refs[3][...] += yeb


@functools.partial(jax.jit,
                   static_argnames=("n_cams", "with_schur", "interpret"))
def assemble_streams(ai, aj, bp, r2, l00, l10, l11, g0, g1, mi, mj,
                     n_cams: int, with_schur: bool = True,
                     interpret: bool = False):
    """Fused accumulation over match blocks. M must be a multiple of
    the 512-match block (ba capacities are multiples of 512) — inactive
    matches contribute zeros by construction since ba._assemble masks
    Ai/Aj/B/r. Returns (U (6N,6N), eA (6N,), YW (6N,6N), yeb (6N,))."""
    M = ai.shape[0]
    sN = 6 * n_cams
    block = min(_BLOCK, M)
    assert M % block == 0, (M, block)
    grid = (M // block,)
    cols = _split_args(ai, aj, bp, r2, l00, l10, l11, g0, g1, mi, mj)
    m_spec = [pl.BlockSpec((block, c.shape[1]), lambda i: (i, 0))
              for c in cols]
    out_spec = [pl.BlockSpec((sN, sN), lambda i: (0, 0)),
                pl.BlockSpec((sN, 1), lambda i: (0, 0)),
                pl.BlockSpec((sN, sN), lambda i: (0, 0)),
                pl.BlockSpec((sN, 1), lambda i: (0, 0))]
    out_shape = [jax.ShapeDtypeStruct((sN, sN), jnp.float32),
                 jax.ShapeDtypeStruct((sN, 1), jnp.float32),
                 jax.ShapeDtypeStruct((sN, sN), jnp.float32),
                 jax.ShapeDtypeStruct((sN, 1), jnp.float32)]
    kwargs = {}
    if not interpret:
        # the J/W/Z tiles for a 512-match block exceed the default 16 MB
        # scoped-VMEM limit at 6N=240; v5e has 128 MB
        from jax.experimental.pallas import tpu as pltpu
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=100_000_000)
    U, eA, YW, yeb = pl.pallas_call(
        functools.partial(_kernel, n_cams=n_cams, with_schur=with_schur,
                          use_pltpu=not interpret),
        grid=grid,
        in_specs=m_spec,
        out_specs=out_spec,
        out_shape=out_shape,
        interpret=interpret,
        **kwargs,
    )(*cols)
    return U, eA[:, 0], YW, yeb[:, 0]
