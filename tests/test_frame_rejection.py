import pytest
pytestmark = pytest.mark.slow
"""Degenerate-frame guard: bad frames must not corrupt the map."""

import numpy as np

import jax
import jax.numpy as jnp

from sfm_mvs_tpu.models.incremental import init_from_bootstrap, register_frame
from sfm_mvs_tpu.ops import sift
from sfm_mvs_tpu.utils.config import FrontendConfig, MapConfig, SfmConfig
from sfm_mvs_tpu.utils.synthetic import render_staircase_sequence


def test_unrelated_frame_rejected():
    imgs, Rt, K = render_staircase_sequence(
        num_cameras=3, arc_degrees=12, image_size=(320, 240)
    )
    cfg = SfmConfig(
        fx=float(K[0, 0]), fy=float(K[1, 1]), cx=float(K[0, 2]), cy=float(K[1, 2]),
        downscale=1,
        frontend=FrontendConfig(
            max_features=1024, num_octaves=3, upsample_input=True,
            contrast_threshold=0.015, lowe_ratio=0.75,
        ),
        map=MapConfig(max_cameras=8, max_points=16384),
    )
    Kj = jnp.asarray(cfg.intrinsic_matrix())
    feats = [sift.detect_and_compute(jnp.asarray(g), cfg.frontend) for g in imgs]
    bgr = [
        jnp.asarray(np.repeat((g * 255.0)[..., None], 3, -1)) for g in imgs
    ]
    key = jax.random.PRNGKey(0)
    pstate, _ = init_from_bootstrap(key, feats[0], feats[1], bgr[1], Kj, cfg)
    n_pts_before = int(pstate.map.num_points)
    n_cams_before = int(pstate.map.num_cams)

    # A completely unrelated image (different texture seed) cannot be
    # registered; the guard must reject it and keep state identical.
    bad_imgs, _, _ = render_staircase_sequence(
        num_cameras=1, image_size=(320, 240), seed=777
    )
    bad_feats = sift.detect_and_compute(jnp.asarray(bad_imgs[0]), cfg.frontend)
    bad_bgr = jnp.asarray(np.repeat((bad_imgs[0] * 255.0)[..., None], 3, -1))
    new_pstate, st = register_frame(jax.random.PRNGKey(1), pstate, bad_feats, bad_bgr, cfg)
    assert not bool(st.accepted)
    assert int(new_pstate.map.num_points) == n_pts_before
    assert int(new_pstate.map.num_cams) == n_cams_before
    np.testing.assert_array_equal(
        np.asarray(new_pstate.prev_track), np.asarray(pstate.prev_track)
    )

    # The good third frame still registers against the preserved state.
    new_pstate, st = register_frame(
        jax.random.PRNGKey(2), new_pstate, feats[2], bgr[2], cfg
    )
    assert bool(st.accepted)
    assert int(new_pstate.map.num_cams) == n_cams_before + 1
