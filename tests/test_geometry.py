import numpy as np
import pytest

import jax.numpy as jnp

from simplepanorama_tpu.geometry.canvas import (
    get_pan_dimension, get_translation, apply_h_np)
from simplepanorama_tpu.geometry.graph import (
    connectivity_score, connected_components, order_nodes_by_connection)
from simplepanorama_tpu.geometry.rotation import (
    rodrigues, rotvec_from_matrix, orthogonalize, approximate_rot)
from simplepanorama_tpu.geometry.focal import focal_from_hom


def test_pan_dimension():
    d = get_pan_dimension([(0, 0), (50, -20)], [(100, 200), (100, 200)])
    assert d.min_x == 0 and d.min_y == -20
    assert d.max_x == 250 and d.max_y == 100
    assert d.width == 250 and d.height == 120


def test_translation_identity():
    T, xs, xe, ys, ye = get_translation((100, 200), (100, 200), np.eye(3))
    assert xs == 0 and ys == 0
    np.testing.assert_allclose(T, np.eye(3))


def test_connected_components_splits_and_sorts():
    adj = np.zeros((5, 5))
    adj[0, 1] = 1.0
    adj[1, 2] = 2.0
    adj[3, 4] = 1.0
    comps = connected_components(adj)
    assert [c.nodes for c in comps] == [[0, 1, 2], [3, 4]]
    # connectivity of middle node (1) is highest in first component
    assert np.argmax(comps[0].connectivity) == 1


def test_order_nodes_by_connection():
    adj = np.zeros((4, 4))
    adj[0, 1] = 3.0
    adj[1, 2] = 2.0
    adj[2, 3] = 1.0
    sym = adj + adj.T
    order = order_nodes_by_connection(sym)
    nodes = [n for n, _ in order]
    assert nodes[0] == 1  # max weighted degree (3+2)
    assert order[1] == (0, 1)
    assert order[2] == (2, 1)
    assert order[3] == (3, 2)


def test_rodrigues_round_trip():
    rng = np.random.default_rng(1)
    for _ in range(10):
        v = rng.normal(size=3) * 0.8
        R = np.asarray(rodrigues(jnp.asarray(v)))
        # orthonormal
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-5)
        v2 = np.asarray(rotvec_from_matrix(jnp.asarray(R)))
        np.testing.assert_allclose(v, v2, atol=1e-4)


def test_rodrigues_matches_cv2():
    import cv2
    rng = np.random.default_rng(2)
    for _ in range(5):
        v = rng.normal(size=3)
        R_cv, _ = cv2.Rodrigues(v)
        R = np.asarray(rodrigues(jnp.asarray(v)))
        np.testing.assert_allclose(R, R_cv, atol=1e-5)


def test_approximate_rot_recovers_rotation():
    rng = np.random.default_rng(3)
    v = rng.normal(size=3) * 0.3
    import cv2
    R_true, _ = cv2.Rodrigues(v)
    K = np.diag([700.0, 700.0, 1.0])
    H = K @ R_true @ np.linalg.inv(K)
    R_est = np.asarray(approximate_rot(jnp.asarray(K), jnp.asarray(K),
                                       jnp.asarray(H)))
    np.testing.assert_allclose(R_est, R_true, atol=1e-4)


def test_focal_from_hom_synthetic():
    # H = K R K^-1 for a pure rotation: focal should be recovered
    import cv2
    f = 650.0
    K = np.diag([f, f, 1.0])
    # generic axis: axis-aligned rotations hit exact-zero denominators that
    # the reference's focal formulas (and ours) reject as degenerate
    R, _ = cv2.Rodrigues(np.array([0.05, 0.25, 0.03]))
    H = K @ R @ np.linalg.inv(K)
    n = 2
    hom = np.zeros((n, n, 3, 3))
    hom[0, 1] = H
    adj = np.zeros((n, n))
    adj[0, 1] = 1.0
    est = focal_from_hom(hom, adj)
    assert abs(est - f) / f < 0.05
