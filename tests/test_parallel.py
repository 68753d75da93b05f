"""Sharded front end + distributed BA on the 8-device virtual CPU mesh."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow

import jax
import jax.numpy as jnp

from sfm_mvs_tpu.models import ba, map_store
from sfm_mvs_tpu.ops import lie
from sfm_mvs_tpu.parallel import distributed_ba, frontend, mesh as meshlib
from sfm_mvs_tpu.utils.config import FrontendConfig, MapConfig
from sfm_mvs_tpu.utils.synthetic import make_scene, render_staircase_sequence


@pytest.fixture(scope="module")
def mesh8():
    assert len(jax.devices()) == 8, "conftest must provide 8 virtual devices"
    return meshlib.make_mesh((8,), ("data",))


def test_detect_batch_sharded_matches_single(mesh8):
    imgs, _, _ = render_staircase_sequence(num_cameras=8, image_size=(160, 128))
    cfg = FrontendConfig(
        max_features=256, num_octaves=2, upsample_input=False,
        contrast_threshold=0.015,
    )
    batch = jnp.asarray(np.stack(imgs))
    f_sharded = frontend.detect_batch_sharded(batch, cfg, mesh8)
    from sfm_mvs_tpu.ops import sift

    f_single = sift.detect_and_compute(batch[3], cfg)
    np.testing.assert_allclose(
        np.asarray(f_sharded.xy[3]), np.asarray(f_single.xy), atol=1e-4
    )
    np.testing.assert_array_equal(
        np.asarray(f_sharded.valid[3]), np.asarray(f_single.valid)
    )


def test_match_pairs_sharded(mesh8):
    imgs, _, _ = render_staircase_sequence(num_cameras=8, image_size=(160, 128))
    cfg = FrontendConfig(
        max_features=256, num_octaves=2, upsample_input=False,
        contrast_threshold=0.015, lowe_ratio=0.8,
    )
    feats = frontend.detect_batch(jnp.asarray(np.stack(imgs)), cfg)
    pair0 = jnp.arange(0, 8, dtype=jnp.int32) % 7  # 8 pairs
    pair1 = pair0 + 1
    m = frontend.match_pairs_sharded(feats, pair0, pair1, mesh8, cfg)
    assert m.idx1.shape == (8, 256)
    # adjacent rendered views must share matches (small 160x128 images)
    assert int(np.asarray(m.valid).sum(axis=1).min()) >= 8


def _ba_state(rng, C=4, P=256):
    scene = make_scene(num_points=P, num_cameras=C, arc_degrees=40)
    cfgm = MapConfig(max_cameras=8, max_points=512)
    state = map_store.init_map(jnp.asarray(scene.K), cfgm)
    for c in range(C):
        state, _ = map_store.append_camera(state, jnp.asarray(scene.Rt[c]))
    Xn = scene.points + rng.normal(scale=0.05, size=(P, 3)).astype(np.float32)
    state, pids = map_store.append_points(
        state, jnp.asarray(Xn), jnp.zeros((P, 3)), jnp.ones(P, dtype=bool)
    )
    for c in range(C):
        uv, _ = scene.project(c)
        state = map_store.append_observations(
            state, c, pids, jnp.asarray(uv.astype(np.float32)), jnp.ones(P, dtype=bool)
        )
    poses = np.asarray(state.poses).copy()
    rv, tv = lie.matrix_to_rt(jnp.asarray(scene.Rt[1]))
    poses[1] = np.asarray(
        lie.rt_to_matrix(
            jnp.asarray(np.asarray(rv) + 0.02), jnp.asarray(np.asarray(tv) + 0.05)
        )
    )
    return state._replace(poses=jnp.asarray(poses)), scene


def test_distributed_ba_matches_single_device(rng, mesh8):
    state, scene = _ba_state(rng)
    single, s_stats = ba.bundle_adjust_map(state, max_iterations=8, cg_iters=15)
    shard, d_stats = distributed_ba.bundle_adjust_map_sharded(
        state, mesh8, max_iterations=8, cg_iters=15
    )
    # identical LM trajectory: same costs and near-identical parameters
    assert float(s_stats.initial_cost) == pytest.approx(
        float(d_stats.initial_cost), rel=1e-5
    )
    assert float(s_stats.final_cost) == pytest.approx(
        float(d_stats.final_cost), rel=1e-2, abs=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(shard.poses), np.asarray(single.poses), atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(shard.points), np.asarray(single.points), atol=1e-3
    )


def test_windowed_ba_sharded_matches_single_device(rng, mesh8):
    """bundle_adjust_window_sharded must reproduce the single-device
    windowed solve (config-4 scale runs the windowed path sharded)."""
    state, scene = _ba_state(rng)
    single, s_stats = ba.bundle_adjust_window(
        state, window_cams=4, window_points=512, max_iterations=6,
        cg_iters=12, freeze_cams=1,
    )
    shard, d_stats = distributed_ba.bundle_adjust_window_sharded(
        state, mesh8, window_cams=4, window_points=512, max_iterations=6,
        cg_iters=12, freeze_cams=1,
    )
    assert float(s_stats.initial_cost) == pytest.approx(
        float(d_stats.initial_cost), rel=1e-5
    )
    assert float(s_stats.final_cost) == pytest.approx(
        float(d_stats.final_cost), rel=1e-2, abs=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(shard.poses), np.asarray(single.poses), atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(shard.points), np.asarray(single.points), atol=1e-3
    )


def test_distributed_ba_converges(rng, mesh8):
    state, scene = _ba_state(rng)
    _, stats = distributed_ba.bundle_adjust_map_sharded(
        state, mesh8, max_iterations=15, cg_iters=20
    )
    assert float(stats.final_cost) < 1e-2
