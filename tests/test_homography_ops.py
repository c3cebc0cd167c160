import numpy as np
import pytest

import jax
import jax.numpy as jnp

from simplepanorama_tpu.ops.homography import (
    dlt_homography, ransac_homography, hom_sanity, apply_h)
from simplepanorama_tpu.ops.polygon import (
    quad_rect_intersection_area, points_in_quad, overlap_stats)


def random_h(rng):
    H = np.eye(3) + rng.normal(scale=0.1, size=(3, 3))
    H[2, :2] = rng.normal(scale=1e-4, size=2)
    H[2, 2] = 1.0
    return H


def test_dlt_exact_recovery(rng):
    H = random_h(rng)
    train = rng.uniform(-200, 200, size=(4, 2))
    q = np.concatenate([train, np.ones((4, 1))], axis=1) @ H.T
    query = q[:, :2] / q[:, 2:3]
    H_est = np.array(dlt_homography(jnp.asarray(query), jnp.asarray(train)))
    H_est /= H_est[2, 2]
    np.testing.assert_allclose(H_est, H / H[2, 2], atol=1e-3)


def test_ransac_recovers_homography_with_outliers(rng):
    H = random_h(rng)
    M = 256
    n_good = 160
    train = rng.uniform(-300, 300, size=(M, 2)).astype(np.float32)
    q = np.concatenate([train, np.ones((M, 1))], axis=1) @ H.T
    query = (q[:, :2] / q[:, 2:3]).astype(np.float32)
    # corrupt the tail
    query[n_good:] += rng.uniform(50, 200, size=(M - n_good, 2))
    valid = np.ones(M, bool)

    img_hw = jnp.array([600, 800])
    H_est, inliers = ransac_homography(
        jnp.asarray(query), jnp.asarray(train), jnp.asarray(valid),
        img_hw, img_hw, jax.random.PRNGKey(0), n_iter=500, margin=4.0)
    H_est = np.array(H_est)
    H_est /= H_est[2, 2]
    np.testing.assert_allclose(H_est, H / H[2, 2], atol=5e-2)
    inl = np.asarray(inliers)
    assert inl[:n_good].mean() > 0.95
    assert inl[n_good:].mean() < 0.05


def test_hom_sanity_identity_ok():
    hw = jnp.array([600, 800])
    assert bool(hom_sanity(jnp.eye(3), hw, hw))


def test_hom_sanity_rejects_reflection_and_nan():
    hw = jnp.array([600, 800])
    refl = jnp.diag(jnp.array([-1.0, 1.0, 1.0]))
    assert not bool(hom_sanity(refl, hw, hw))
    bad = jnp.eye(3).at[0, 0].set(jnp.nan)
    assert not bool(hom_sanity(bad, hw, hw))


def test_quad_rect_area_matches_cv2(rng):
    import cv2
    for _ in range(10):
        quad = rng.uniform(-150, 150, size=(4, 2)).astype(np.float32)
        # make convex + ordered: use the convex hull of the points if 4 pts
        hull = cv2.convexHull(quad).reshape(-1, 2)
        if hull.shape[0] != 4:
            continue
        hw, hh = 100.0, 80.0
        rect = np.array([[-hw, -hh], [hw, -hh], [hw, hh], [-hw, hh]],
                        np.float32)
        area_ref, _ = cv2.intersectConvexConvex(hull, rect)
        area = float(quad_rect_intersection_area(
            jnp.asarray(hull), jnp.asarray(hw), jnp.asarray(hh)))
        assert abs(area - area_ref) <= max(1e-2 * area_ref, 1e-3)


def test_points_in_quad():
    quad = jnp.array([[-1.0, -1.0], [1.0, -1.0], [1.0, 1.0], [-1.0, 1.0]])
    pts = jnp.array([[0.0, 0.0], [2.0, 0.0], [0.99, 0.99], [-1.0, 0.0]])
    res = np.asarray(points_in_quad(pts, quad))
    assert list(res) == [True, False, True, True]
    # clockwise orientation must work too
    res2 = np.asarray(points_in_quad(pts, quad[::-1]))
    assert list(res2) == [True, False, True, True]


def test_overlap_stats_half_shift():
    # identity H, image2 shifted right by half its width -> overlap 50%
    hw = jnp.array([100, 200])
    H = jnp.eye(3).at[0, 2].set(100.0)
    kp1 = jnp.array([[0.0, 0.0], [-90.0, 0.0], [90.0, 0.0]])
    kp_valid = jnp.array([True, True, True])
    frac, n_kp, n_m = overlap_stats(H, hw, hw, kp1, kp_valid, kp1, kp_valid)
    assert abs(float(frac) - 0.5) < 1e-5
    # overlap region is x in [0, 100]: kp (0,0) and (90,0) inside
    assert int(n_kp) == 2
