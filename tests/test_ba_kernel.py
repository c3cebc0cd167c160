"""Fused BA normal-equation kernel (ops/ba_kernel.py): the Pallas
program must be value-equivalent to the jnp reference implementation
(interpret mode on the CPU mesh; the real-chip path is exercised by the
same entry point with interpret=False)."""

import numpy as np
import pytest


@pytest.mark.parametrize("with_schur", [True, False])
def test_assemble_streams_matches_reference(with_schur):
    import jax.numpy as jnp
    from simplepanorama_tpu.ops import ba_kernel as bk

    rng = np.random.default_rng(0)
    M, N = 1024, 8
    f32 = lambda *s: jnp.asarray(rng.normal(size=s).astype(np.float32))
    ai, aj = f32(M, 2, 6), f32(M, 2, 6)
    bp, r2 = f32(M, 2, 2), f32(M, 2)
    l00 = jnp.asarray(rng.uniform(0.5, 1, (M,)).astype(np.float32))
    l10 = f32(M)
    l11 = jnp.asarray(rng.uniform(0.5, 1, (M,)).astype(np.float32))
    g0, g1 = f32(M), f32(M)
    mi = jnp.asarray(rng.integers(0, N - 1, M).astype(np.int32))
    mj = jnp.asarray((np.asarray(mi) + 1).astype(np.int32))

    args = (ai, aj, bp, r2, l00, l10, l11, g0, g1, mi, mj)
    ref = bk.assemble_streams_ref(*args, N, with_schur=with_schur)
    out = bk.assemble_streams(*args, N, with_schur=with_schur,
                              interpret=True)
    for a, b, name in zip(ref, out, ["U", "eA", "YW", "yeb"]):
        a, b = np.asarray(a), np.asarray(b)
        scale = np.abs(a).max() + 1e-6
        assert np.abs(a - b).max() < 1e-3 * scale + 1e-4, name


def test_assemble_streams_matches_ba_assemble():
    """The reference implementation must equal the U/eA/YW/yeb that
    ba._assemble produces internally (checked via the Schur system it
    returns), on a real BA problem."""
    import jax
    import jax.numpy as jnp
    from simplepanorama_tpu import ba
    from simplepanorama_tpu.ops import ba_kernel as bk

    rng = np.random.default_rng(1)
    N, M = 8, 1024
    mi = rng.integers(0, N - 1, M).astype(np.int32)
    data = ba.BAData(
        mi=jnp.asarray(mi), mj=jnp.asarray((mi + 1).astype(np.int32)),
        q=jnp.asarray(rng.uniform(-300, 300, (M, 2)).astype(np.float32)),
        t=jnp.asarray(rng.uniform(-300, 300, (M, 2)).astype(np.float32)),
        m_valid=jnp.ones(M, bool))
    data = ba.with_pair_tables(data)
    cams = ba.CamState(
        focal=jnp.full((N,), 700.0), ppal=jnp.zeros((N, 2)),
        rotvec=jnp.asarray(
            rng.normal(0, 0.05, (N, 3)).astype(np.float32)),
        b=data.t)
    active = jnp.ones(N, bool)
    active_m = data.m_valid
    lam = 0.05

    S, rhs, Vinv, W, eB = jax.jit(
        lambda c: ba._assemble(c, data, active_m, lam, active, False, N)
    )(cams)

    # rebuild the same quantities through the kernel-reference streams
    c6 = ba._cam6(cams)
    Ht, (Dit, Djt), pid = ba._pair_tables(data, c6, N, with_jac=True)
    Hm = Ht[pid]
    bh, p2, Jp = ba._match_geometry(Hm, cams.b)
    r = jnp.concatenate([data.t - cams.b, data.q - p2], -1)
    dHb_i = (Dit[pid] * bh[:, None, :, None]).sum(2)
    dHb_j = (Djt[pid] * bh[:, None, :, None]).sum(2)
    Ai = -(Jp[:, :, :, None] * dHb_i[:, None, :, :]).sum(2)
    Aj = -(Jp[:, :, :, None] * dHb_j[:, None, :, :]).sum(2)
    B23 = -(Jp[:, :, :, None] * Hm[:, None, :, :2]).sum(2)
    l00 = jnp.sqrt(jnp.maximum(Vinv[:, 0, 0], 0.0))
    l10 = Vinv[:, 1, 0] / jnp.where(l00 > 0, l00, 1.0)
    l11 = jnp.sqrt(jnp.maximum(Vinv[:, 1, 1] - l10 * l10, 0.0))
    g0 = Vinv[:, 0, 0] * eB[:, 0] + Vinv[:, 0, 1] * eB[:, 1]
    g1 = Vinv[:, 1, 0] * eB[:, 0] + Vinv[:, 1, 1] * eB[:, 1]

    U, eA, YW, yeb = bk.assemble_streams_ref(
        Ai, Aj, B23, r[:, 2:], l00, l10, l11, g0, g1,
        data.mi, data.mj, N)
    aug = jnp.concatenate([
        jnp.repeat(cams.focal[:, None] * ba._AUG_FOCAL, 3, axis=1),
        jnp.full((N, 3), ba._AUG_ANG)], axis=1).reshape(-1)
    U_aug = U + jnp.diag(jnp.diag(U) * lam * aug)
    S2 = U_aug - YW
    rhs2 = (-eA) - yeb

    sS = float(np.abs(np.asarray(S)).max())
    assert np.abs(np.asarray(S2 - S)).max() < 1e-3 * sS
    srhs = float(np.abs(np.asarray(rhs)).max()) + 1e-6
    assert np.abs(np.asarray(rhs2 - rhs)).max() < 1e-3 * srhs
