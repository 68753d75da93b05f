"""Projection / homogeneous ops vs cv2.projectPoints oracle."""

import numpy as np
import pytest

import jax.numpy as jnp

from sfm_mvs_tpu.ops import projection
from sfm_mvs_tpu.utils.synthetic import make_scene

cv2 = pytest.importorskip("cv2")


def test_homogeneous_roundtrip(rng):
    pts = rng.normal(size=(50, 3)).astype(np.float32)
    h = projection.to_homogeneous(jnp.asarray(pts))
    assert h.shape == (50, 4)
    back = np.asarray(projection.from_homogeneous(h))
    np.testing.assert_allclose(back, pts, atol=1e-6)


def test_project_matches_cv2(rng):
    scene = make_scene(num_points=100, num_cameras=2)
    Rt = scene.Rt[1]
    uv_ours = np.asarray(
        projection.project(jnp.asarray(scene.points), jnp.asarray(Rt), jnp.asarray(scene.K))
    )
    rvec, _ = cv2.Rodrigues(Rt[:3, :3].astype(np.float64))
    uv_cv, _ = cv2.projectPoints(
        scene.points.astype(np.float64), rvec, Rt[:3, 3].astype(np.float64),
        scene.K.astype(np.float64), None,
    )
    np.testing.assert_allclose(uv_ours, uv_cv[:, 0, :], atol=1e-2)


def test_masked_error_zero_for_exact(rng):
    scene = make_scene(num_points=64, num_cameras=1)
    uv, _ = scene.project(0)
    mask = jnp.ones(64, dtype=bool)
    err = projection.masked_rms_reprojection_error(
        jnp.asarray(scene.points), jnp.asarray(uv), jnp.asarray(scene.Rt[0]),
        jnp.asarray(scene.K), mask,
    )
    assert float(err) < 1e-2


def test_masked_error_ignores_invalid(rng):
    scene = make_scene(num_points=64, num_cameras=1)
    uv, _ = scene.project(0)
    uv = uv.copy()
    uv[32:] += 1000.0  # corrupt masked-out entries
    mask = jnp.arange(64) < 32
    err = projection.masked_rms_reprojection_error(
        jnp.asarray(scene.points), jnp.asarray(uv), jnp.asarray(scene.Rt[0]),
        jnp.asarray(scene.K), mask,
    )
    assert float(err) < 1e-2


def test_normalize_points(rng):
    scene = make_scene(num_points=32, num_cameras=1)
    uv, _ = scene.project(0)
    norm = np.asarray(projection.normalize_points(jnp.asarray(uv), jnp.asarray(scene.K)))
    Kinv = np.linalg.inv(scene.K)
    expected = (np.concatenate([uv, np.ones((32, 1))], axis=1) @ Kinv.T)[:, :2]
    np.testing.assert_allclose(norm, expected, atol=1e-5)


def test_hartley_normalization(rng):
    pts = jnp.asarray(rng.normal(scale=100.0, size=(64, 2)).astype(np.float32) + 500.0)
    mask = jnp.ones(64, dtype=bool)
    npts, T = projection.hartley_normalization(pts, mask)
    # zero mean, RMS distance sqrt(2)
    np.testing.assert_allclose(np.asarray(jnp.mean(npts, axis=0)), 0.0, atol=1e-3)
    rms = float(jnp.sqrt(jnp.mean(jnp.sum(npts**2, axis=-1))))
    assert abs(rms - np.sqrt(2)) < 1e-3
    # T applied to homogeneous pts reproduces npts
    h = np.asarray(projection.to_homogeneous(pts)) @ np.asarray(T).T
    np.testing.assert_allclose(h[:, :2], np.asarray(npts), atol=1e-3)
