import pytest
pytestmark = pytest.mark.slow
"""Sharded map-store queries == their replicated single-device forms."""

import numpy as np

import jax
import jax.numpy as jnp

from sfm_mvs_tpu.parallel import mesh as meshlib, sharded_map
from sfm_mvs_tpu.ops import projection


def _mesh():
    n = min(8, len(jax.devices()))
    return meshlib.make_mesh((n,), ("data",), devices=jax.devices()[:n]), n


def test_lookup_points_sharded_matches_gather(rng):
    mesh, n = _mesh()
    P = 1024
    pts = jnp.asarray(rng.normal(size=(P, 3)).astype(np.float32))
    valid = jnp.asarray(rng.random(P) > 0.3)
    tids = jnp.asarray(
        np.concatenate([rng.integers(0, P, 120), [-1, -1, P - 1, 0]]).astype(np.int32)
    )
    X, ok = sharded_map.lookup_points_sharded(pts, valid, tids, mesh)
    safe = jnp.clip(tids, 0, P - 1)
    exp_ok = (tids >= 0) & valid[safe]
    exp_X = jnp.where((tids >= 0)[:, None], pts[safe], 0.0)
    np.testing.assert_array_equal(np.asarray(ok), np.asarray(exp_ok))
    np.testing.assert_allclose(np.asarray(X), np.asarray(exp_X), atol=1e-6)


def test_nearest_projected_sharded_matches_dense(rng):
    from sfm_mvs_tpu.utils.synthetic import make_scene

    mesh, n = _mesh()
    scene = make_scene(num_points=512, num_cameras=2)
    pts = jnp.asarray(scene.points)
    valid = jnp.asarray(rng.random(512) > 0.2)
    pose = jnp.asarray(scene.Rt[1])
    K = jnp.asarray(scene.K)
    uv_q = jnp.asarray(rng.uniform(0, 600, size=(64, 2)).astype(np.float32))

    d2_s, z_s = sharded_map.nearest_projected_sharded(pts, valid, pose, K, uv_q, mesh)

    # Replicated reference.
    uv_map, depth = projection.project_depth(pts, pose, K)
    ok = valid & (depth > 0)
    d2 = (
        jnp.sum(uv_q * uv_q, axis=1)[:, None]
        + jnp.sum(uv_map * uv_map, axis=1)[None, :]
        - 2.0 * uv_q @ uv_map.T
    )
    d2 = jnp.where(ok[None, :], d2, jnp.inf)
    np.testing.assert_allclose(
        np.asarray(d2_s), np.asarray(jnp.min(d2, axis=1)), rtol=1e-4, atol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(z_s),
        np.asarray(depth[jnp.argmin(d2, axis=1)]),
        rtol=1e-5,
        atol=1e-5,
    )
