import pytest
pytestmark = pytest.mark.slow
"""Track-based global SfM (test.py analog) + exhaustive view graph (isfm)."""

import numpy as np

import jax.numpy as jnp

from sfm_mvs_tpu.models import exhaustive
from sfm_mvs_tpu.models.tracks import GlobalSfM, chain_tracks
from sfm_mvs_tpu.ops import homography
from sfm_mvs_tpu.utils.config import FrontendConfig, MapConfig, SfmConfig
from sfm_mvs_tpu.utils.synthetic import render_plane_sequence, render_staircase_sequence


def _cfg(K, max_cams=8):
    return SfmConfig(
        fx=float(K[0, 0]), fy=float(K[1, 1]), cx=float(K[0, 2]), cy=float(K[1, 2]),
        downscale=1,
        frontend=FrontendConfig(
            max_features=1024, num_octaves=3, upsample_input=True,
            contrast_threshold=0.015, lowe_ratio=0.75,
        ),
        map=MapConfig(max_cameras=max_cams, max_points=16384),
    )


def test_chain_tracks_identity():
    kp = jnp.asarray(np.random.default_rng(0).uniform(10, 100, (16, 2)).astype(np.float32))
    Hs = jnp.stack([jnp.eye(3)] * 3)  # 4 frames, identity chain
    tracks, valid = chain_tracks(kp, jnp.ones(16, bool), Hs, jnp.asarray([320.0, 240.0]))
    assert tracks.shape == (4, 16, 2)
    for f in range(4):
        np.testing.assert_allclose(np.asarray(tracks[f]), np.asarray(kp), atol=1e-4)
    assert np.asarray(valid).all()


def test_chain_tracks_known_homography():
    rng = np.random.default_rng(1)
    kp1 = rng.uniform(50, 200, (32, 2)).astype(np.float32)
    H = np.array([[1.05, 0.01, 3.0], [-0.02, 0.98, -2.0], [1e-5, -1e-5, 1.0]], np.float32)
    # kp in frame1; frame0 coords = H^-1 kp
    tracks, valid = chain_tracks(
        jnp.asarray(kp1), jnp.ones(32, bool), jnp.asarray(H)[None],
        jnp.asarray([400.0, 400.0]),
    )
    expected0 = np.asarray(
        homography.apply_homography(jnp.linalg.inv(jnp.asarray(H)), jnp.asarray(kp1))
    )
    np.testing.assert_allclose(np.asarray(tracks[0]), expected0, atol=1e-3)
    np.testing.assert_allclose(np.asarray(tracks[1]), kp1, atol=1e-5)


def test_global_sfm_on_plane_sequence():
    """Homography-chained tracks are exact for planar scenes — the setting
    the reference's test.py variant was built for (fountain-P11-like)."""
    imgs, Rt_gt, K = render_plane_sequence(
        num_cameras=4, image_size=(320, 240), arc_degrees=18, radius=6.0
    )
    cfg = _cfg(K)
    g = GlobalSfM(cfg)
    state = g.run(imgs, run_ba=True)
    assert int(np.asarray(state.cam_valid).sum()) == 4
    assert int(state.num_points) > 100
    # planar scene: E-based pair poses are ambiguous, but PnP against the
    # triangulated cloud + global BA must still give a consistent model:
    # check reprojection, not absolute pose.
    from sfm_mvs_tpu.models import ba as ba_mod

    cost = float(ba_mod._cost(ba_mod.problem_from_map(state)))
    assert cost < 4.0  # mean squared px

    state2 = g.final_sweep(imgs)
    assert int(state2.num_points) > int(state.num_points)


def test_view_graph_staircase():
    imgs, Rt_gt, K = render_staircase_sequence(
        num_cameras=4, arc_degrees=24, image_size=(320, 240)
    )
    cfg = _cfg(K)
    graph = exhaustive.build_view_graph(imgs, cfg, batch_size=4)
    assert len(graph.pair_i) == 6  # C(4,2)
    # adjacent pairs should have the most inliers; far pairs fewer
    adj = graph.adjacency
    assert adj[0, 1] > adj[0, 3]
    assert (adj == adj.T).all()
    assert adj[0, 1] > 30
    i, j = exhaustive.best_bootstrap_pair(graph)
    assert (i, j) in {(0, 1), (1, 2), (2, 3)}
