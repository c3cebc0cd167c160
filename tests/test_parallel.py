"""Distribution tests on the 8-device virtual CPU mesh (the fake backend
the reference lacks — SURVEY §4): sharded BA must match single-device BA."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from simplepanorama_tpu import ba
from simplepanorama_tpu.parallel import make_mesh, lm_run_sharded


def _problem(rng, n_cams=4, M=512):
    from simplepanorama_tpu.stitch import _rodrigues_np
    f = 700.0
    rotvecs = [np.array([0.0, 0.2 * i, 0.01 * i]) for i in range(n_cams)]
    K = np.diag([f, f, 1.0])
    mi = rng.integers(0, n_cams - 1, M).astype(np.int32)
    mj = (mi + 1).astype(np.int32)
    t = rng.uniform(-200, 200, (M, 2)).astype(np.float32)
    q = np.zeros_like(t)
    for m in range(M):
        Ri = _rodrigues_np(rotvecs[mi[m]])
        Rj = _rodrigues_np(rotvecs[mj[m]])
        H = K @ Ri.T @ Rj @ np.linalg.inv(K)
        p = H @ np.array([t[m, 0], t[m, 1], 1.0])
        q[m] = p[:2] / p[2]
    data = ba.BAData(mi=jnp.asarray(mi), mj=jnp.asarray(mj),
                     q=jnp.asarray(q), t=jnp.asarray(t),
                     m_valid=jnp.ones(M, bool))
    cams = ba.CamState(
        focal=jnp.full((n_cams,), f * 1.05, jnp.float32),
        ppal=jnp.zeros((n_cams, 2), jnp.float32),
        rotvec=jnp.asarray(np.stack(
            [np.zeros(3)] + [r + 0.02 for r in rotvecs[1:]]
        ).astype(np.float32)),
        b=data.t)
    return cams, data


def test_sharded_lm_matches_single_device():
    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device CPU mesh")
    rng = np.random.default_rng(0)
    cams, data = _problem(rng)
    active = jnp.ones(4, bool)
    res1 = ba.lm_run(cams, data, active, 0.05, fast=True, max_iter=10)
    mesh = make_mesh(8)
    res8 = lm_run_sharded(cams, data, active, 0.05, mesh, fast=True,
                          max_iter=10)
    # f32 cross-shard reduction order shifts accept/reject decisions
    # slightly; both runs must land on the same optimum basin
    np.testing.assert_allclose(float(res1.error), float(res8.error),
                               rtol=1e-2)
    np.testing.assert_allclose(np.asarray(res1.cams.rotvec),
                               np.asarray(res8.cams.rotvec), atol=5e-3)


@pytest.mark.parametrize("fast", [True, False])
def test_shard_map_lm_loop_matches_single_device(fast):
    """The FULL LM loop (lambda schedule + 6-strike stop) under shard_map
    with explicit psums must land where ba.lm_run lands — for BOTH the
    fast/Lowe and the relaxed (Schur + local delta_b) objectives
    (_bundle_adjust_main.cpp:346-413, 456-510)."""
    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device CPU mesh")
    from simplepanorama_tpu.parallel import lm_run_shard_map
    rng = np.random.default_rng(2)
    cams, data = _problem(rng)
    active = jnp.ones(4, bool)
    res1 = ba.lm_run(cams, data, active, 0.05, fast=fast, max_iter=12)
    mesh = make_mesh(8)
    res8 = lm_run_shard_map(cams, data, active, 0.05, mesh, fast=fast,
                            max_iter=12)
    np.testing.assert_allclose(float(res1.error), float(res8.error),
                               rtol=1e-2)
    np.testing.assert_allclose(np.asarray(res1.cams.rotvec),
                               np.asarray(res8.cams.rotvec), atol=5e-3)
    if not fast:
        # the relaxed objective must actually move the b points
        assert float(jnp.abs(res8.cams.b - data.t).max()) > 1e-4


def test_shard_map_step_reduces_error():
    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device CPU mesh")
    from jax import shard_map
    from jax.sharding import PartitionSpec as P
    from simplepanorama_tpu.parallel.dist_ba import make_lm_step_shard_map

    rng = np.random.default_rng(1)
    cams, data = _problem(rng)
    active = jnp.ones(4, bool)
    mesh = make_mesh(8)
    step = make_lm_step_shard_map(mesh, 4, fast=True)
    sharded = P("data")
    rep = P()
    f = shard_map(step, mesh=mesh,
                  in_specs=(ba.CamState(focal=rep, ppal=rep, rotvec=rep,
                                        b=sharded),
                            ba.BAData(mi=sharded, mj=sharded, q=sharded,
                                      t=sharded, m_valid=sharded),
                            rep, rep),
                  out_specs=(ba.CamState(focal=rep, ppal=rep, rotvec=rep,
                                         b=sharded), rep, rep))
    err0 = float(ba.total_error(cams, data, data.m_valid, True))
    new_cams, err_new, ok = jax.jit(f)(cams, data, active,
                                       jnp.asarray(0.05, jnp.float32))
    assert bool(ok)
    assert float(err_new) < err0


def test_checkpoint_roundtrip(tmp_path):
    from simplepanorama_tpu.stitch import StitchResult
    from simplepanorama_tpu.utils import save_stitch_state, load_stitch_state
    res = StitchResult(
        rot=np.tile(np.eye(3), (3, 1, 1)),
        K=np.tile(np.diag([700.0, 700, 1]), (3, 1, 1)),
        adj=np.triu(np.ones((3, 3)), 1),
        connectivity=np.array([1.0, 2.0, 1.0]),
        order=[(1, -1), (0, 1), (2, 1)],
        nodes=[0, 1, 2], center=1,
        sizes=[(400, 600)] * 3)
    p = tmp_path / "state.npz"
    save_stitch_state(p, res)
    r2 = load_stitch_state(p)
    np.testing.assert_allclose(r2.K, res.K)
    assert r2.order == res.order and r2.nodes == res.nodes
    assert r2.center == 1 and r2.sizes == res.sizes
