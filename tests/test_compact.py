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


def test_merge_duplicate_points():
    """Two points describing the same landmark (split tracks after a loop
    closure) merge: observations unite on the survivor, the duplicate is
    invalidated, geometric conflicts and chains are refused."""
    import jax.numpy as jnp
    import numpy as np

    from sfm_mvs_tpu.models import map_store
    from sfm_mvs_tpu.utils.config import MapConfig

    K = jnp.asarray([[100.0, 0, 64], [0, 100.0, 48], [0, 0, 1]], jnp.float32)
    state = map_store.init_map(K, MapConfig(max_cameras=4, max_points=64))
    for c in range(4):
        state, _ = map_store.append_camera(state, jnp.eye(3, 4))
    pts = np.zeros((6, 3), np.float32)
    pts[0] = [0.0, 0.0, 5.0]      # landmark A, chain 1
    pts[1] = [0.005, 0.0, 5.0]    # landmark A, chain 2 (duplicate)
    pts[2] = [1.0, 0.0, 5.0]      # landmark B (isolated)
    pts[3] = [2.0, 0.0, 5.0]      # landmark C, chain 1
    pts[4] = [2.004, 0.0, 5.0]    # landmark C, duplicate BUT conflicting
    pts[5] = [0.008, 0.0, 5.0]    # landmark A, chain 3 (chain case)
    state, pids = map_store.append_points(
        state, jnp.asarray(pts), jnp.zeros((6, 3)), jnp.ones(6, bool)
    )
    uv = np.zeros((64, 4, 2), np.float32)
    mask = np.zeros((64, 4), bool)
    # A chain 1 observed in cams 0,1; chain 2 in cams 2,3 (disjoint);
    # chain 3 in cam 1 at the SAME pixel as chain 1 (no conflict).
    mask[0, :2] = True; uv[0, :2] = [10.0, 10.0]
    mask[1, 2:] = True; uv[1, 2:] = [11.0, 10.0]
    mask[5, 1] = True; uv[5, 1] = [10.5, 10.0]
    # B observed alone.
    mask[2, 0] = True; uv[2, 0] = [50.0, 50.0]
    # C chains share cam 0 with a 30px disagreement -> conflict.
    mask[3, 0] = True; uv[3, 0] = [80.0, 40.0]
    mask[4, 0] = True; uv[4, 0] = [110.0, 40.0]
    state = state._replace(obs_uv=jnp.asarray(uv), obs_mask=jnp.asarray(mask))

    out, remap, n = map_store.merge_duplicate_points(
        state, jnp.asarray(0.02), jnp.asarray(4.0)
    )
    pvo = np.asarray(out.point_valid)
    mo = np.asarray(out.obs_mask)
    # Exactly ONE merge happened: the closest A-duplicate into A chain 1.
    assert int(n) == 1
    merged = int(np.asarray(remap)[1])
    assert merged == 0 and not pvo[1]
    # A's survivor holds the union of both chains' observations.
    assert mo[0].sum() == 4
    np.testing.assert_allclose(
        np.asarray(out.obs_uv)[0, 2], [11.0, 10.0], atol=1e-6
    )
    # chain 1's own observations untouched
    np.testing.assert_allclose(
        np.asarray(out.obs_uv)[0, 0], [10.0, 10.0], atol=1e-6
    )
    # Conflicting C pair refused; isolated B untouched; chain-3 point
    # (whose nearest neighbor is NOT a root after the A merge candidate
    # structure) survives for the next pass.
    assert pvo[2] and pvo[3] and pvo[4]
    # Second pass collapses the remaining A chain into the survivor.
    out2, remap2, n2 = map_store.merge_duplicate_points(
        out, jnp.asarray(0.02), jnp.asarray(4.0)
    )
    assert int(n2) == 1
    assert int(np.asarray(remap2)[5]) == 0
    assert not np.asarray(out2.point_valid)[5]
