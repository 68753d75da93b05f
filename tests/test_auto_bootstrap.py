"""View-graph consumption: auto bootstrap-pair selection + loop closures.

The reference's isfm.py computes all-pairs inlier counts and discards them
(SURVEY.md §3.5); here they drive (a) which pair initializes the map and
(b) which non-adjacent pairs contribute re-observations before final BA.
"""

import numpy as np
import pytest

pytestmark = pytest.mark.slow

from sfm_mvs_tpu.models import exhaustive
from sfm_mvs_tpu.models.incremental import IncrementalSfM
from sfm_mvs_tpu.utils import evaluate
from sfm_mvs_tpu.utils.config import FrontendConfig, MapConfig, SfmConfig
from sfm_mvs_tpu.utils.synthetic import render_staircase_sequence


def _cfg(K, **kw):
    return SfmConfig(
        fx=float(K[0, 0]), fy=float(K[1, 1]), cx=float(K[0, 2]), cy=float(K[1, 2]),
        downscale=1,
        frontend=FrontendConfig(
            max_features=1024, num_octaves=3, upsample_input=True,
            contrast_threshold=0.015, lowe_ratio=0.75,
        ),
        map=MapConfig(max_cameras=8, max_points=16384),
        **kw,
    )


@pytest.fixture(scope="module")
def degenerate_start_scene():
    """Frames 0 and 1 are IDENTICAL (zero baseline): the reference's
    fixed (0,1) bootstrap is degenerate by construction."""
    imgs, Rt_gt, K = render_staircase_sequence(
        num_cameras=5, arc_degrees=24, image_size=(320, 240)
    )
    imgs = [imgs[0], imgs[0]] + list(imgs[1:])
    Rt_gt = np.concatenate([Rt_gt[:1], Rt_gt], axis=0)
    return imgs, Rt_gt, K


def test_parallax_flags_zero_baseline_pair(degenerate_start_scene):
    imgs, Rt_gt, K = degenerate_start_scene
    graph = exhaustive.build_view_graph(imgs, _cfg(K), window=3)
    m = {(int(i), int(j)): k for k, (i, j) in
         enumerate(zip(graph.pair_i, graph.pair_j))}
    # the duplicated pair has many inliers but ~no parallax
    dup = m[(0, 1)]
    real = m[(1, 2)]
    assert graph.num_inliers[dup] > 50
    assert graph.parallax_deg[dup] < 0.2
    assert graph.parallax_deg[real] > 5 * graph.parallax_deg[dup]
    a, b = exhaustive.best_bootstrap_pair(graph)
    assert (a, b) != (0, 1)


def test_auto_bootstrap_reconstructs_degenerate_start(degenerate_start_scene):
    imgs, Rt_gt, K = degenerate_start_scene
    cfg = _cfg(K, bootstrap="auto", view_graph_window=3)
    sfm = IncrementalSfM(cfg)
    state = sfm.run(imgs)
    assert sfm.bootstrap_pair != (0, 1)
    n_cams = int(np.asarray(state.cam_valid).sum())
    assert n_cams == 6
    poses = np.asarray(state.poses)[np.asarray(state.cam_valid)]
    ate = evaluate.ate_rmse(poses, Rt_gt)
    assert ate < 0.05
    # the duplicated frames must land on (nearly) the same pose
    c = evaluate.camera_centers(poses)
    assert np.linalg.norm(c[0] - c[1]) < 0.1


def test_auto_matches_seq_on_clean_scene():
    """On a well-behaved scene auto selection must not hurt."""
    imgs, Rt_gt, K = render_staircase_sequence(
        num_cameras=5, arc_degrees=24, image_size=(320, 240)
    )
    auto = IncrementalSfM(_cfg(K, bootstrap="auto", view_graph_window=3))
    state = auto.run(imgs)
    poses = np.asarray(state.poses)[np.asarray(state.cam_valid)]
    assert len(poses) == 5
    assert evaluate.ate_rmse(poses, Rt_gt) < 0.05


def test_loop_closures_add_observations():
    imgs, Rt_gt, K = render_staircase_sequence(
        num_cameras=6, arc_degrees=30, image_size=(320, 240)
    )
    cfg = _cfg(K, loop_close_pairs=4)
    sfm = IncrementalSfM(cfg)
    state = sfm.run(imgs)
    from sfm_mvs_tpu.models import map_store

    obs_before = int(map_store.num_observations(state))
    state = sfm.finalize()
    assert sfm.finalize_info.get("loop_closure_obs", 0) > 0
    poses = np.asarray(state.poses)[np.asarray(state.cam_valid)]
    assert evaluate.ate_rmse(poses, Rt_gt) < 0.05
    # injected observations survive the cull (they are geometric inliers)
    tl = np.asarray(state.obs_mask).sum()
    assert tl > 0.9 * obs_before


def test_epipolar_verified_injection_sees_through_drift():
    """The map-agreement gate rejects matches that disagree with a DRIFTED
    pose; pair-local E-RANSAC verification is drift-independent, so with a
    loose sanity gate the same matches inject (the stitch path that
    straightens long arcs in benchmarks/large_scene.py)."""
    import jax
    import jax.numpy as jnp

    from sfm_mvs_tpu.models.incremental import IncrementalSfM

    imgs, Rt_gt, K = render_staircase_sequence(
        num_cameras=6, arc_degrees=30, image_size=(320, 240)
    )
    cfg = _cfg(K)
    sfm = IncrementalSfM(cfg)
    state = sfm.run(imgs)
    feats = sfm._cam_feats
    # Simulate accumulated drift: rotate the LAST camera by ~2 degrees.
    import sfm_mvs_tpu.ops.lie as lie

    cam_j = int(np.asarray(state.cam_valid).sum()) - 1
    poses = np.asarray(state.poses).copy()
    dR = np.asarray(lie.so3_exp(jnp.asarray([0.0, 0.035, 0.0])))
    poses[cam_j, :, :3] = dR @ poses[cam_j, :, :3]
    drifted = state._replace(poses=jnp.asarray(poses))
    # The sequential driver keeps per-camera features + track vectors
    # (consumed by its own loop-closure pass in finalize()).
    track1 = sfm._cam_tracks[1]
    key = jax.random.PRNGKey(3)
    args = (
        jnp.asarray(1, jnp.int32), jnp.asarray(cam_j, jnp.int32),
        feats[1], feats[cam_j], jnp.asarray(track1),
    )
    _, n_map_gate = exhaustive.inject_reobservations(drifted, *args, cfg)
    _, n_epi_gate = exhaustive.inject_reobservations(
        drifted, *args, cfg, key=key, max_err_px=64.0, epipolar_verify=True
    )
    # ~2 deg of drift at f=400 is a ~25px offset: the 4px map gate drops
    # (nearly) everything; the epipolar gate keeps a real population
    # (bounded by how many frame-1 tracks lack a cam_j observation).
    assert int(n_epi_gate) >= 10
    assert int(n_map_gate) <= int(n_epi_gate) // 3


def test_batched_injection_matches_sequential():
    """inject_reobservations_batch (one dispatch, distinct targets) must
    produce the same observation grid as the sequential per-pair calls."""
    import jax
    import jax.numpy as jnp

    imgs, Rt_gt, K = render_staircase_sequence(
        num_cameras=6, arc_degrees=30, image_size=(320, 240)
    )
    cfg = _cfg(K)
    sfm = IncrementalSfM(cfg)
    state = sfm.run(imgs)
    feats, tracks = sfm._cam_feats, sfm._cam_tracks
    pairs = [(0, 3), (1, 4), (2, 5)]  # distinct targets
    keys = jax.random.split(jax.random.PRNGKey(11), len(pairs))

    seq = state
    for (i, j), k in zip(pairs, keys):
        seq, _ = exhaustive.inject_reobservations(
            seq, jnp.asarray(i), jnp.asarray(j), feats[i], feats[j],
            jnp.asarray(tracks[i]), cfg,
            key=k, max_err_px=32.0, epipolar_verify=True,
        )

    stack = lambda xs: jax.tree_util.tree_map(lambda *l: jnp.stack(l), *xs)
    fi = stack([feats[i] for i, _ in pairs])
    fj = stack([feats[j] for _, j in pairs])
    ti = jnp.stack([jnp.asarray(tracks[i]) for i, _ in pairs])
    cam_js = jnp.asarray([j for _, j in pairs])
    # Pad one invalid slot to prove the pair_valid mask works.
    pad = lambda t: jax.tree_util.tree_map(
        lambda a: jnp.concatenate([a, a[:1]]), t
    )
    bat, counts = exhaustive.inject_reobservations_batch(
        state, jnp.concatenate([cam_js, cam_js[:1]]),
        pad(fi), pad(fj), jnp.concatenate([ti, ti[:1]]),
        jnp.asarray([True, True, True, False]), cfg,
        jnp.concatenate([keys, keys[:1]]),
        max_err_px=32.0, epipolar_verify=True,
    )
    assert int(counts[3]) == 0  # padded slot injected nothing
    assert int(counts[:3].sum()) > 0
    np.testing.assert_array_equal(
        np.asarray(seq.obs_mask), np.asarray(bat.obs_mask)
    )
    np.testing.assert_allclose(
        np.asarray(seq.obs_uv), np.asarray(bat.obs_uv), atol=1e-5
    )
