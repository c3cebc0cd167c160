"""Bundle-adjustment tests: finite-difference Jacobian oracle (the
reference's own validation mechanism, ret_A_i_num/ret_B_i_num,
/root/reference/src/math/_bundle_adjust_tools.cpp:360-442,612-749) and
synthetic-scene convergence."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from simplepanorama_tpu import ba


def _rand_cam(rng, f=700.0):
    return np.concatenate([[f + rng.normal() * 5],
                           rng.normal(size=2) * 3,
                           rng.normal(size=3) * 0.2]).astype(np.float32)


def test_jacobian_matches_finite_differences():
    rng = np.random.default_rng(0)
    cam_i = jnp.asarray(_rand_cam(rng))
    cam_j = jnp.asarray(_rand_cam(rng))
    b = jnp.asarray(rng.uniform(-200, 200, 2).astype(np.float32))
    q = jnp.asarray(rng.uniform(-200, 200, 2).astype(np.float32))
    t = jnp.asarray(rng.uniform(-200, 200, 2).astype(np.float32))

    Ai, Aj, B = ba._res_jac(cam_i, cam_j, b, q, t)

    def num_jac(f, x, eps):
        x = np.asarray(x, np.float64)
        cols = []
        for k in range(x.size):
            xp = x.copy(); xp[k] += eps
            xm = x.copy(); xm[k] -= eps
            cols.append((np.asarray(f(jnp.asarray(xp, jnp.float32)))
                         - np.asarray(f(jnp.asarray(xm, jnp.float32))))
                        / (2 * eps))
        return np.stack(cols, axis=1)

    Ai_num = num_jac(lambda c: ba._match_residual(c, cam_j, b, q, t),
                     cam_i, 1e-2)
    Aj_num = num_jac(lambda c: ba._match_residual(cam_i, c, b, q, t),
                     cam_j, 1e-2)
    B_num = num_jac(lambda c: ba._match_residual(cam_i, cam_j, c, q, t),
                    b, 1e-2)
    np.testing.assert_allclose(np.asarray(Ai), Ai_num, rtol=2e-2, atol=2e-2)
    np.testing.assert_allclose(np.asarray(Aj), Aj_num, rtol=2e-2, atol=2e-2)
    np.testing.assert_allclose(np.asarray(B), B_num, rtol=2e-2, atol=2e-2)


def _synthetic_problem(rng, n_cams=3, f=700.0, n_per_pair=40, noise=0.0):
    """Cameras on a rotation arc; matches generated exactly from the BA
    model H(i,j) = K_j R_i^T R_j K_i^-1, so the ground truth has zero
    residual."""
    from simplepanorama_tpu.stitch import _rodrigues_np

    rotvecs = [np.array([0.0, 0.25 * i, 0.02 * i]) for i in range(n_cams)]
    K = np.diag([f, f, 1.0])
    Kinv = np.linalg.inv(K)
    mi, mj, qs, ts = [], [], [], []
    for i in range(n_cams):
        for j in range(n_cams):
            if abs(i - j) != 1:
                continue
            Ri = _rodrigues_np(rotvecs[i])
            Rj = _rodrigues_np(rotvecs[j])
            H = K @ Ri.T @ Rj @ Kinv
            t = rng.uniform(-250, 250, (n_per_pair, 2))
            th = np.concatenate([t, np.ones((n_per_pair, 1))], 1) @ H.T
            q = th[:, :2] / th[:, 2:3]
            keep = (np.abs(q) < 300).all(1)
            t, q = t[keep], q[keep]
            if noise:
                q = q + rng.normal(0, noise, q.shape)
                t = t + rng.normal(0, noise, t.shape)
            mi.extend([i] * len(t))
            mj.extend([j] * len(t))
            qs.append(q)
            ts.append(t)
    M = len(mi)
    cap = (M + 255) // 256 * 256
    data = ba.BAData(
        mi=jnp.asarray(np.pad(np.array(mi, np.int32), (0, cap - M))),
        mj=jnp.asarray(np.pad(np.array(mj, np.int32), (0, cap - M))),
        q=jnp.asarray(np.pad(np.concatenate(qs).astype(np.float32),
                             ((0, cap - M), (0, 0)))),
        t=jnp.asarray(np.pad(np.concatenate(ts).astype(np.float32),
                             ((0, cap - M), (0, 0)))),
        m_valid=jnp.asarray(np.arange(cap) < M))
    return data, rotvecs, f


def _run(data, n_cams, f0, rot0, fast):
    cams = ba.CamState(
        focal=jnp.full((n_cams,), f0, jnp.float32),
        ppal=jnp.zeros((n_cams, 2), jnp.float32),
        rotvec=jnp.asarray(np.stack(rot0).astype(np.float32)),
        b=data.t)
    return ba.lm_run(cams, data, jnp.ones(n_cams, bool), 0.05, fast=fast)


def test_lm_converges_fast_objective():
    rng = np.random.default_rng(1)
    data, rotvecs, f = _synthetic_problem(rng)
    # perturbed init: identity-ish rotations (first camera exactly identity
    # = frozen gauge anchor), focal off by 10%
    rot0 = [np.zeros(3)] + [r + rng.normal(0, 0.03, 3) for r in rotvecs[1:]]
    res = _run(data, 3, f * 1.1, rot0, fast=True)
    n_matches = int(np.asarray(data.m_valid).sum())
    err = float(res.error) / n_matches
    # the focal/rotation gauge valley is shallow: with a 10%-off focal
    # init and the reference's 50-trial cap, LM lands well inside the 4px
    # inlier margin but not at the exact ground truth
    assert err < 1.5, f"mean residual {err:.3f}px too high"
    rv = np.asarray(res.cams.rotvec)
    for i in (1, 2):
        assert np.linalg.norm(rv[i] - rotvecs[i]) < 0.02
    assert int(res.n_accepted) >= 5


def test_lm_converges_relaxed_objective():
    rng = np.random.default_rng(2)
    data, rotvecs, f = _synthetic_problem(rng, noise=0.5)
    rot0 = [np.zeros(3)] + [r + rng.normal(0, 0.03, 3) for r in rotvecs[1:]]
    res = _run(data, 3, f * 1.05, rot0, fast=False)
    n_matches = int(np.asarray(data.m_valid).sum())
    err = float(res.error) / n_matches
    assert err < 2.0, f"mean residual {err:.3f}px too high"
    rv = np.asarray(res.cams.rotvec)
    for i in (1, 2):
        assert np.linalg.norm(rv[i] - rotvecs[i]) < 0.05
    assert int(res.n_accepted) >= 3


def _chain_problem(rng, n=4, f=700.0):
    """Synthetic n-camera chain: ground-truth rotations, noisy matches,
    consistent homography table — the incremental driver's input."""
    from simplepanorama_tpu.stitch import _rodrigues_np
    from simplepanorama_tpu.adjacency import Adjacency
    from simplepanorama_tpu.geometry.graph import Component
    rotvecs = [np.array([0.0, 0.22 * i, 0.015 * i]) for i in range(n)]
    K = np.diag([f, f, 1.0])
    Kinv = np.linalg.inv(K)
    adj = np.zeros((n, n))
    hom = np.zeros((n, n, 3, 3))
    matches = {}
    for i in range(n - 1):
        j = i + 1
        Ri, Rj = _rodrigues_np(rotvecs[i]), _rodrigues_np(rotvecs[j])
        H = K @ Ri.T @ Rj @ Kinv          # maps image-j pts -> image-i
        t = rng.uniform(-250, 250, (60, 2))
        th = np.concatenate([t, np.ones((60, 1))], 1) @ H.T
        q = th[:, :2] / th[:, 2:3]
        keep = (np.abs(q) < 300).all(1)
        q, t = (q[keep] + rng.normal(0, 0.3, (keep.sum(), 2)),
                t[keep] + rng.normal(0, 0.3, (keep.sum(), 2)))
        matches[(i, j)] = (q.astype(np.float32), t.astype(np.float32))
        adj[i, j] = 0.5
        hom[i, j] = H / H[2, 2]
        hom[j, i] = np.linalg.inv(H)
        hom[j, i] /= hom[j, i, 2, 2]
    adj_sym = adj + adj.T
    comp = Component(adj=np.triu(adj_sym),
                     connectivity=adj_sym.sum(1) / np.maximum(
                         (adj_sym == 0).sum(1), 1),
                     nodes=list(range(n)))
    adjres = Adjacency(adj=adj, raw_counts=adj, hom_mat=hom,
                       matches=matches)
    return comp, adjres, rotvecs


def test_fused_driver_matches_host_driver():
    """The fused single-program incremental driver (_incremental_lm in a
    fori_loop) must land where the per-addition host loop lands."""
    from simplepanorama_tpu.stitch import (bundle_adjust_stitching,
                                           _rodrigues_np)
    from simplepanorama_tpu.config import Config

    rng = np.random.default_rng(5)
    n, f = 4, 700.0
    comp, adjres, rotvecs = _chain_problem(rng, n, f)
    sizes = [(480, 640)] * n
    cfg = Config()

    res_host = bundle_adjust_stitching(comp, adjres, sizes, f, cfg,
                                       fused=False)
    res_fused = bundle_adjust_stitching(comp, adjres, sizes, f, cfg,
                                        fused=True)
    # both must recover the ground-truth relative rotations
    for res in (res_host, res_fused):
        for i in range(1, n):
            R_rel = res.rot[0].T @ res.rot[i]
            R_true = _rodrigues_np(rotvecs[0]).T @ _rodrigues_np(rotvecs[i])
            assert np.abs(R_rel - R_true).max() < 0.02
    # and agree with each other
    np.testing.assert_allclose(res_fused.rot, res_host.rot, atol=0.02)
    np.testing.assert_allclose(res_fused.K[:, 0, 0], res_host.K[:, 0, 0],
                               rtol=0.03)


def test_fused_driver_cancellable_and_reports_progress():
    """Cancellation must abort the fused BA between chunk dispatches (the
    reference polls per node-addition, _stitch.cpp:240), and progress
    must tick DURING the schedule, not after it returns."""
    from simplepanorama_tpu.stitch import bundle_adjust_stitching
    from simplepanorama_tpu.config import Config

    rng = np.random.default_rng(7)
    n, f = 8, 700.0
    comp, adjres, _ = _chain_problem(rng, n, f)
    sizes = [(480, 640)] * n
    cfg = Config()

    ticks = []
    bundle_adjust_stitching(comp, adjres, sizes, f, cfg, fused=True,
                            progress=ticks.append)
    assert len(ticks) >= 2, "progress must tick per chunk, not once"
    assert abs(sum(ticks) - 1.0) < 1e-6

    calls = {"n": 0}

    def cancel_after_first():
        calls["n"] += 1
        return calls["n"] > 2   # allow the pre-loop poll + first chunk

    with pytest.raises(RuntimeError, match="canceled"):
        bundle_adjust_stitching(comp, adjres, sizes, f, cfg, fused=True,
                                cancelled=cancel_after_first)


def test_inactive_cameras_untouched():
    rng = np.random.default_rng(3)
    data, rotvecs, f = _synthetic_problem(rng, n_cams=3)
    # pad to 5 cameras, activate only 3
    cams = ba.CamState(
        focal=jnp.full((5,), f, jnp.float32),
        ppal=jnp.zeros((5, 2), jnp.float32),
        rotvec=jnp.asarray(np.stack(
            [np.zeros(3)] + rotvecs[1:] + [np.ones(3), np.ones(3)]
        ).astype(np.float32)),
        b=data.t)
    active = jnp.asarray(np.array([1, 1, 1, 0, 0], bool))
    res = ba.lm_run(cams, data, active, 0.05, fast=True)
    rv = np.asarray(res.cams.rotvec)
    np.testing.assert_allclose(rv[3], np.ones(3))
    np.testing.assert_allclose(rv[4], np.ones(3))
    assert np.isfinite(float(res.error))
