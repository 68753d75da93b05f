"""Capacity right-sizing: compact_points + shrink_map keep the problem
identical while cutting the dense-grid BA's capacity-proportional cost."""

import numpy as np
import jax.numpy as jnp

from sfm_mvs_tpu.models import ba as ba_mod
from sfm_mvs_tpu.models import map_store
from sfm_mvs_tpu.utils.config import MapConfig


def _holey_map():
    cfg = MapConfig(max_cameras=4, max_points=64)
    state = map_store.init_map(jnp.eye(3) * 300.0, cfg)
    for c in range(3):
        pose = jnp.concatenate(
            [jnp.eye(3), jnp.asarray([[0.3 * c], [0.0], [0.0]])], axis=1
        )
        state, _ = map_store.append_camera(state, pose)
    rng = np.random.default_rng(0)
    X = jnp.asarray(rng.uniform([-1, -1, 4], [1, 1, 6], (40, 3)), jnp.float32)
    state, pids = map_store.append_points(
        state, X, jnp.zeros((40, 3)), jnp.ones((40,), bool)
    )
    for c in range(3):
        uv = jnp.asarray(rng.uniform(0, 200, (40, 2)), jnp.float32)
        state = map_store.append_observations(
            state, jnp.asarray(c), pids, uv, jnp.ones((40,), bool)
        )
    # Punch holes: invalidate every third point (as culling would).
    pv = np.array(state.point_valid)
    pv[::3] = False
    state = state._replace(
        point_valid=jnp.asarray(pv),
        obs_mask=state.obs_mask & jnp.asarray(pv)[:, None],
    )
    return state


def test_compact_preserves_problem():
    state = _holey_map()
    cost0 = float(ba_mod._cost(ba_mod.problem_from_map(state)))
    n0 = int(np.asarray(state.point_valid).sum())
    obs0 = int(map_store.num_observations(state))

    packed, remap = map_store.compact_points(state)
    n1 = int(np.asarray(packed.point_valid).sum())
    assert n1 == n0 == int(packed.num_points)
    # all live points now at the front
    pv = np.asarray(packed.point_valid)
    assert pv[:n1].all() and not pv[n1:].any()
    assert int(map_store.num_observations(packed)) == obs0
    # remap sends old valid indices to their new home
    old_pv = np.asarray(state.point_valid)
    r = np.asarray(remap)
    assert (r[old_pv] >= 0).all() and (r[~old_pv] == -1).all()
    np.testing.assert_allclose(
        np.asarray(packed.points)[r[old_pv]],
        np.asarray(state.points)[old_pv],
    )
    np.testing.assert_allclose(
        float(ba_mod._cost(ba_mod.problem_from_map(packed))), cost0, rtol=1e-6
    )


def test_shrink_after_compact():
    state = _holey_map()
    packed, _ = map_store.compact_points(state)
    cost0 = float(ba_mod._cost(ba_mod.problem_from_map(packed)))
    small = map_store.shrink_map(packed, 32)
    assert small.points.shape == (32, 3)
    assert small.obs_uv.shape[0] == 32
    np.testing.assert_allclose(
        float(ba_mod._cost(ba_mod.problem_from_map(small))), cost0, rtol=1e-6
    )
    # no-op when capacity already fits
    assert map_store.shrink_map(small, 64) is small
