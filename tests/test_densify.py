"""Densification sweep: reference-level cloud density from the solved
trajectory (sfm.py:387-395 accumulate-everything / test.py:339-380)."""

import dataclasses

import numpy as np
import pytest

pytestmark = pytest.mark.slow

from sfm_mvs_tpu.models import densify, map_store
from sfm_mvs_tpu.models.incremental import IncrementalSfM
from sfm_mvs_tpu.utils import evaluate
from sfm_mvs_tpu.utils.config import (
    FrontendConfig, MapConfig, SfmConfig, SweepConfig,
)
from sfm_mvs_tpu.utils.synthetic import render_staircase_sequence


@pytest.fixture(scope="module")
def swept():
    imgs, Rt_gt, K = render_staircase_sequence(
        num_cameras=5, arc_degrees=24, image_size=(320, 240)
    )
    cfg = SfmConfig(
        fx=float(K[0, 0]), fy=float(K[1, 1]), cx=float(K[0, 2]), cy=float(K[1, 2]),
        downscale=1,
        # Lean run-time budget (the registration loop's bottleneck) ...
        frontend=FrontendConfig(
            max_features=512, num_octaves=3, upsample_input=True,
            contrast_threshold=0.015, lowe_ratio=0.75,
        ),
        map=MapConfig(max_cameras=8, max_points=4096),
        # ... densified by a one-time sweep at a 4x budget.
        sweep=SweepConfig(
            enabled=True, grow_points=16384, reproj_px=1.5,
            max_features=2048, contrast_threshold=0.01,
        ),
    )
    sfm = IncrementalSfM(cfg)
    sfm.run(imgs)
    before = int(np.asarray(sfm.state.map.point_valid).sum())
    state = sfm.finalize()
    return sfm, state, Rt_gt, before, cfg


def test_grow_map_preserves_content():
    import jax.numpy as jnp

    cfg = MapConfig(max_cameras=4, max_points=8)
    state = map_store.init_map(jnp.eye(3), cfg)
    state, _ = map_store.append_camera(state, jnp.ones((3, 4)))
    X = jnp.arange(6, dtype=jnp.float32).reshape(2, 3)
    state, pids = map_store.append_points(
        state, X, jnp.zeros((2, 3)), jnp.array([True, True])
    )
    state = map_store.append_observations(
        state, jnp.asarray(0), pids, jnp.ones((2, 2)), jnp.array([True, True])
    )
    big = map_store.grow_map(state, 32)
    assert big.points.shape == (32, 3)
    assert big.obs_uv.shape == (32, 4, 2)
    np.testing.assert_array_equal(np.asarray(big.points[:8]), np.asarray(state.points))
    np.testing.assert_array_equal(
        np.asarray(big.obs_mask[:8]), np.asarray(state.obs_mask)
    )
    assert int(big.num_points) == 2
    assert not np.asarray(big.point_valid[8:]).any()
    # growing to a smaller/equal capacity is a no-op
    assert map_store.grow_map(state, 8) is state


def test_sweep_multiplies_point_count(swept):
    sfm, state, Rt_gt, before, cfg = swept
    after = int(np.asarray(state.point_valid).sum())
    assert after >= 2 * before
    assert sfm.finalize_info["swept_points"] > 0


def test_sweep_keeps_reprojection_quality(swept):
    """Swept points must reproject well in every observing camera."""
    from sfm_mvs_tpu.models import ba as ba_mod

    sfm, state, Rt_gt, before, cfg = swept
    prob = ba_mod.problem_from_map(state)
    r = ba_mod._res_grid(prob.cam_params, prob.points, prob.obs_uv, prob.K)
    err = np.asarray(np.linalg.norm(np.asarray(r), axis=-1))
    mask = np.asarray(state.obs_mask)
    assert np.sqrt((err[mask] ** 2).mean()) < 1.5


def test_sweep_preserves_trajectory(swept):
    sfm, state, Rt_gt, before, cfg = swept
    poses = np.asarray(state.poses)[np.asarray(state.cam_valid)]
    assert evaluate.ate_rmse(poses, Rt_gt) < 0.05


def test_sweep_is_idempotent_via_dedup(swept):
    """Re-sweeping the already-dense map must add almost nothing: every
    candidate now coincides with an existing point and is deduplicated."""
    sfm, state, Rt_gt, before, cfg = swept
    first = sfm.finalize_info["swept_points"]
    _, again = densify.densify_sweep(state, sfm._cam_feats, sfm._cam_bgr, cfg)
    assert again < 0.15 * first


def test_sweep_observations_consistent(swept):
    sfm, state, Rt_gt, before, cfg = swept
    mask = np.asarray(state.obs_mask)
    pv = np.asarray(state.point_valid)
    n_cams = int(state.num_cams)
    assert not mask[:, n_cams:].any()
    assert not mask[~pv].any()
    assert (mask[pv].sum(axis=1) >= 2).all()
