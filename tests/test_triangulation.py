"""DLT triangulation: exactness on noiseless synthetic scenes + cv2 parity."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sfm_mvs_tpu.ops import triangulation
from sfm_mvs_tpu.utils.synthetic import make_scene

cv2 = pytest.importorskip("cv2")


def _projections(scene):
    P0 = scene.K @ scene.Rt[0]
    P1 = scene.K @ scene.Rt[1]
    return P0.astype(np.float32), P1.astype(np.float32)


def test_noiseless_exactness():
    scene = make_scene(num_points=256, num_cameras=2)
    uv0, _ = scene.project(0)
    uv1, _ = scene.project(1)
    P0, P1 = _projections(scene)
    X = np.asarray(
        triangulation.triangulate_euclidean(
            jnp.asarray(P0), jnp.asarray(P1), jnp.asarray(uv0), jnp.asarray(uv1)
        )
    )
    err = np.linalg.norm(X - scene.points, axis=1)
    assert np.median(err) < 1e-2
    assert np.mean(err < 0.05) > 0.95


def test_matches_cv2():
    scene = make_scene(num_points=128, num_cameras=2, seed=3)
    uv0, _ = scene.project(0)
    uv1, _ = scene.project(1)
    P0, P1 = _projections(scene)
    X_cv = cv2.triangulatePoints(
        P0.astype(np.float64), P1.astype(np.float64), uv0.T.astype(np.float64),
        uv1.T.astype(np.float64),
    )
    X_cv = (X_cv[:3] / X_cv[3]).T
    X = np.asarray(
        triangulation.triangulate_euclidean(
            jnp.asarray(P0), jnp.asarray(P1), jnp.asarray(uv0), jnp.asarray(uv1)
        )
    )
    np.testing.assert_allclose(X, X_cv, atol=5e-2)


def test_homogeneous_last_is_one():
    scene = make_scene(num_points=32, num_cameras=2)
    uv0, _ = scene.project(0)
    uv1, _ = scene.project(1)
    P0, P1 = _projections(scene)
    Xh = np.asarray(
        triangulation.triangulate_points(
            jnp.asarray(P0), jnp.asarray(P1), jnp.asarray(uv0), jnp.asarray(uv1)
        )
    )
    np.testing.assert_allclose(Xh[:, 3], 1.0, atol=1e-6)


def test_depths():
    scene = make_scene(num_points=64, num_cameras=2)
    d0, d1 = triangulation.triangulation_depths(
        jnp.asarray(scene.Rt[0]), jnp.asarray(scene.Rt[1]), jnp.asarray(scene.points)
    )
    _, d0_true = scene.project(0)
    _, d1_true = scene.project(1)
    np.testing.assert_allclose(np.asarray(d0), d0_true, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(d1), d1_true, rtol=1e-5)
    assert np.all(np.asarray(d0) > 0)


def test_jit_compiles():
    scene = make_scene(num_points=32, num_cameras=2)
    uv0, _ = scene.project(0)
    uv1, _ = scene.project(1)
    P0, P1 = _projections(scene)
    f = jax.jit(triangulation.triangulate_euclidean)
    X = f(jnp.asarray(P0), jnp.asarray(P1), jnp.asarray(uv0), jnp.asarray(uv1))
    assert X.shape == (32, 3)
