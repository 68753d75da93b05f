"""Fixed-capacity map store: masked appends, updates, capacity handling."""

import numpy as np

import jax.numpy as jnp

from sfm_mvs_tpu.models import map_store
from sfm_mvs_tpu.utils.config import MapConfig

CFG = MapConfig(max_cameras=4, max_points=16)


def _state():
    K = jnp.eye(3)
    return map_store.init_map(K, CFG)


def test_append_camera():
    s = _state()
    pose = jnp.arange(12.0).reshape(3, 4)
    s, cid = map_store.append_camera(s, pose)
    assert int(cid) == 0
    assert int(s.num_cams) == 1
    np.testing.assert_allclose(np.asarray(s.poses[0]), np.asarray(pose))
    s, cid = map_store.append_camera(s, pose * 2)
    assert int(cid) == 1


def test_append_points_masked():
    s = _state()
    X = jnp.arange(15.0).reshape(5, 3)
    cols = jnp.ones((5, 3))
    valid = jnp.asarray([True, False, True, True, False])
    s, pids = map_store.append_points(s, X, cols, valid)
    assert int(s.num_points) == 3
    ids = np.asarray(pids)
    assert list(ids) == [0, -1, 1, 2, -1]
    np.testing.assert_allclose(np.asarray(s.points[0]), [0, 1, 2])
    np.testing.assert_allclose(np.asarray(s.points[1]), [6, 7, 8])
    assert np.asarray(s.point_valid)[:3].all()
    assert not np.asarray(s.point_valid)[3:].any()


def test_append_points_capacity_overflow():
    s = _state()
    X = jnp.ones((20, 3))
    valid = jnp.ones(20, dtype=bool)
    s, pids = map_store.append_points(s, X, jnp.ones((20, 3)), valid)
    assert int(s.num_points) == 16  # clamped to capacity
    # overflow rows dropped, no wraparound corruption
    assert np.asarray(s.point_valid).sum() == 16


def test_append_observations_grid():
    s = _state()
    X = jnp.ones((4, 3))
    valid4 = jnp.ones(4, dtype=bool)
    s, pids = map_store.append_points(s, X, jnp.ones((4, 3)), valid4)
    uv = jnp.arange(8.0).reshape(4, 2)
    s = map_store.append_observations(s, 0, pids, uv, valid4)
    assert int(map_store.num_observations(s)) == 4
    mask2 = jnp.asarray([True, True, False, False])
    s = map_store.append_observations(s, 1, pids, uv, mask2)
    assert int(map_store.num_observations(s)) == 6
    om = np.asarray(s.obs_mask)
    assert om[:4, 0].all() and om[0, 1] and om[1, 1]
    assert not om[2, 1] and not om[3, 1]
    np.testing.assert_allclose(np.asarray(s.obs_uv[1, 1]), [2, 3])
    # invalid point ids (-1) are dropped
    s = map_store.append_observations(
        s, 2, jnp.asarray([-1, 0, -1, -1]), uv, valid4
    )
    om = np.asarray(s.obs_mask)
    assert om[:, 2].sum() == 1 and om[0, 2]


def test_update_points_and_poses():
    s = _state()
    s, pids = map_store.append_points(
        s, jnp.zeros((3, 3)), jnp.zeros((3, 3)), jnp.ones(3, dtype=bool)
    )
    newX = jnp.ones((3, 3)) * 7
    s = map_store.update_points(s, pids, newX, jnp.asarray([True, False, True]))
    np.testing.assert_allclose(np.asarray(s.points[0]), 7.0)
    np.testing.assert_allclose(np.asarray(s.points[1]), 0.0)
    pose = jnp.ones((1, 3, 4))
    s, _ = map_store.append_camera(s, jnp.zeros((3, 4)))
    s = map_store.update_poses(s, jnp.asarray([0]), pose, jnp.asarray([True]))
    np.testing.assert_allclose(np.asarray(s.poses[0]), 1.0)
