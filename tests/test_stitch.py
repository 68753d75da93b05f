"""Split-phase stitch: candidates once, cheap re-apply across BA rounds.

Round-4 loop-closure machinery (exhaustive.stitch_candidates_batch /
apply_stitch_batch / covisibility_matrix / retrieve_stitch_pairs): the
expensive match + pair-local E-RANSAC runs once per pair; map-gated
injection is a projection + scatter that re-runs after each BA round.
"""

import numpy as np
import pytest

pytestmark = pytest.mark.slow

import jax
import jax.numpy as jnp

from sfm_mvs_tpu.models import exhaustive
from sfm_mvs_tpu.models.incremental import IncrementalSfM
from sfm_mvs_tpu.utils.config import FrontendConfig, MapConfig, SfmConfig
from sfm_mvs_tpu.utils.synthetic import render_staircase_sequence


def _cfg(K, **kw):
    return SfmConfig(
        fx=float(K[0, 0]), fy=float(K[1, 1]),
        cx=float(K[0, 2]), cy=float(K[1, 2]), downscale=1,
        frontend=FrontendConfig(
            max_features=1024, num_octaves=3, upsample_input=True,
            contrast_threshold=0.015, lowe_ratio=0.75,
        ),
        map=MapConfig(max_cameras=8, max_points=16384),
        **kw,
    )


@pytest.fixture(scope="module")
def recon():
    imgs, Rt_gt, K = render_staircase_sequence(
        num_cameras=6, arc_degrees=30, image_size=(320, 240)
    )
    sfm = IncrementalSfM(_cfg(K))
    state = sfm.run(imgs)
    return sfm, state, K


def _batch(sfm, pairs):
    feats, tracks = sfm._cam_feats, sfm._cam_tracks
    stack = lambda xs: jax.tree_util.tree_map(lambda *l: jnp.stack(l), *xs)
    fi = stack([feats[i] for i, _ in pairs])
    fj = stack([feats[j] for _, j in pairs])
    ti = jnp.stack([jnp.asarray(tracks[i]) for i, _ in pairs])
    tj = jnp.stack([jnp.asarray(tracks[j]) for _, j in pairs])
    cam_is = jnp.asarray([i for i, _ in pairs], jnp.int32)
    cam_js = jnp.asarray([j for _, j in pairs], jnp.int32)
    return cam_is, cam_js, fi, fj, ti, tj


def test_candidates_plus_apply_matches_fused_injection(recon):
    """Direction i->j of the split-phase stitch must reproduce
    inject_reobservations_batch exactly (same keys, same gate)."""
    sfm, state, K = recon
    cfg = sfm.config
    pairs = [(0, 3), (1, 4), (2, 5)]
    keys = jax.random.split(jax.random.PRNGKey(11), len(pairs))
    cam_is, cam_js, fi, fj, ti, tj = _batch(sfm, pairs)
    valid = jnp.ones((len(pairs),), bool)

    ref, counts_ref = exhaustive.inject_reobservations_batch(
        state, cam_js, fi, fj, ti, valid, cfg, keys,
        max_err_px=32.0, epipolar_verify=True,
    )
    cand = exhaustive.stitch_candidates_batch(
        state, cam_is, cam_js, fi, fj, ti, tj, valid, cfg, keys
    )
    out, counts = exhaustive.apply_stitch_batch(
        state, cand.cam_a, cand.tids_a, cand.uv_a, cand.ok,
        jnp.asarray(32.0),
    )
    assert int(counts.sum()) == int(counts_ref.sum()) > 0
    np.testing.assert_array_equal(
        np.asarray(ref.obs_mask), np.asarray(out.obs_mask)
    )
    np.testing.assert_allclose(
        np.asarray(ref.obs_uv), np.asarray(out.obs_uv), atol=1e-5
    )


def test_both_directions_inject_and_reapply_is_idempotent(recon):
    """Direction j->i comes from the SAME match set; applying both
    directions adds observations in both cameras, and re-applying the
    same candidates on the unchanged map injects nothing new (fresh
    gate)."""
    sfm, state, K = recon
    cfg = sfm.config
    pairs = [(0, 4), (1, 5)]
    keys = jax.random.split(jax.random.PRNGKey(5), len(pairs))
    cam_is, cam_js, fi, fj, ti, tj = _batch(sfm, pairs)
    valid = jnp.ones((len(pairs),), bool)
    cand = exhaustive.stitch_candidates_batch(
        state, cam_is, cam_js, fi, fj, ti, tj, valid, cfg, keys
    )
    gate = jnp.asarray(cfg.map.stitch_gate_px)
    s1, ca = exhaustive.apply_stitch_batch(
        state, cand.cam_a, cand.tids_a, cand.uv_a, cand.ok, gate
    )
    s2, cb = exhaustive.apply_stitch_batch(
        s1, cand.cam_b, cand.tids_b, cand.uv_b, cand.ok, gate
    )
    assert int(ca.sum()) > 0 and int(cb.sum()) > 0
    s3, ca2 = exhaustive.apply_stitch_batch(
        s2, cand.cam_a, cand.tids_a, cand.uv_a, cand.ok, gate
    )
    s4, cb2 = exhaustive.apply_stitch_batch(
        s3, cand.cam_b, cand.tids_b, cand.uv_b, cand.ok, gate
    )
    assert int(ca2.sum()) == 0 and int(cb2.sum()) == 0
    np.testing.assert_array_equal(
        np.asarray(s2.obs_mask), np.asarray(s4.obs_mask)
    )


def test_injected_observations_are_geometric_inliers(recon):
    """Both-direction injections on an UNdrifted map must be consistent
    with the current geometry well inside the loose gate."""
    sfm, state, K = recon
    cfg = sfm.config
    pairs = [(0, 4)]
    keys = jax.random.split(jax.random.PRNGKey(9), 1)
    cam_is, cam_js, fi, fj, ti, tj = _batch(sfm, pairs)
    cand = exhaustive.stitch_candidates_batch(
        state, cam_is, cam_js, fi, fj, ti, tj, jnp.ones((1,), bool), cfg,
        keys,
    )
    from sfm_mvs_tpu.ops import projection

    for cam, tids, uv in (
        (cand.cam_a, cand.tids_a, cand.uv_a),
        (cand.cam_b, cand.tids_b, cand.uv_b),
    ):
        s_out, cnt = exhaustive.apply_stitch_batch(
            state, cam, tids, uv, cand.ok, jnp.asarray(4.0)
        )
        n = int(cnt.sum())
        assert n > 0
        # Every newly injected obs reprojects within the strict gate.
        new = np.asarray(s_out.obs_mask) & ~np.asarray(state.obs_mask)
        pids, cams = np.nonzero(new)
        X = np.asarray(s_out.points)[pids]
        for c in np.unique(cams):
            sel = cams == c
            uv_o = np.asarray(s_out.obs_uv)[pids[sel], c]
            uv_p = np.asarray(
                projection.project(
                    jnp.asarray(X[sel]), s_out.poses[int(c)], s_out.K
                )
            )
            assert np.linalg.norm(uv_p - uv_o, axis=-1).max() < 4.01


def test_duplicate_target_cameras_masked_deterministically(recon):
    """VERDICT r4 item 9: duplicate destination cameras in one batch no
    longer hit unspecified XLA scatter order — the guard is in-library.
    The first row with a given target camera wins; later rows inject 0
    and the result equals applying the first row alone."""
    sfm, state, K = recon
    cfg = sfm.config
    pairs = [(0, 4), (1, 4)]  # both target camera 4
    keys = jax.random.split(jax.random.PRNGKey(3), len(pairs))
    cam_is, cam_js, fi, fj, ti, tj = _batch(sfm, pairs)
    valid = jnp.ones((len(pairs),), bool)
    cand = exhaustive.stitch_candidates_batch(
        state, cam_is, cam_js, fi, fj, ti, tj, valid, cfg, keys
    )
    gate = jnp.asarray(cfg.map.stitch_gate_px)
    out, counts = exhaustive.apply_stitch_batch(
        state, cand.cam_a, cand.tids_a, cand.uv_a, cand.ok, gate
    )
    assert int(counts[0]) > 0
    assert int(counts[1]) == 0  # duplicate-target row masked, not raced
    # Equals applying row 0 alone.
    only0 = cand.ok & (jnp.arange(2) == 0)[:, None]
    ref, cref = exhaustive.apply_stitch_batch(
        state, cand.cam_a, cand.tids_a, cand.uv_a, only0, gate
    )
    assert int(cref[0]) == int(counts[0])
    np.testing.assert_array_equal(
        np.asarray(ref.obs_mask), np.asarray(out.obs_mask)
    )
    np.testing.assert_allclose(
        np.asarray(ref.obs_uv), np.asarray(out.obs_uv), atol=0
    )


def test_duplicate_tids_within_row_keep_lowest_error(recon):
    """Advisor r4: two matches of one pair mapping to the same track id
    used to race in the scatter; now the lowest-reprojection-error one
    wins deterministically."""
    from sfm_mvs_tpu.ops import projection

    sfm, state, K = recon
    cfg = sfm.config
    pairs = [(0, 4)]
    keys = jax.random.split(jax.random.PRNGKey(9), 1)
    cam_is, cam_js, fi, fj, ti, tj = _batch(sfm, pairs)
    cand = exhaustive.stitch_candidates_batch(
        state, cam_is, cam_js, fi, fj, ti, tj, jnp.ones((1,), bool), cfg,
        keys,
    )
    ok = np.asarray(cand.ok)[0]
    tids = np.asarray(cand.tids_a)[0]
    sel = np.nonzero(ok & (tids >= 0))[0]
    assert len(sel) >= 2
    a, b = int(sel[0]), int(sel[1])
    # Force slots a and b to claim the SAME track id; give b a slightly
    # perturbed uv so it has strictly larger reprojection error.
    tids_dup = cand.tids_a.at[0, b].set(cand.tids_a[0, a])
    uv_dup = cand.uv_a.at[0, b].set(cand.uv_a[0, a] + 1.5)
    out, counts = exhaustive.apply_stitch_batch(
        state, cand.cam_a, tids_dup, uv_dup, cand.ok, jnp.asarray(64.0)
    )
    cam4 = int(cand.cam_a[0])
    tid = int(np.asarray(cand.tids_a)[0, a])
    uv_expected = np.asarray(
        projection.project(
            state.points[tid][None], state.poses[cam4], state.K
        )
    )[0]
    got = np.asarray(out.obs_uv)[tid, cam4]
    uv_a = np.asarray(cand.uv_a)[0, a]
    # The winner is slot a's uv (closer to the projection), not b's.
    assert np.linalg.norm(got - uv_a) < 1e-4
    assert np.linalg.norm(got - uv_expected) < np.linalg.norm(
        (uv_a + 1.5) - uv_expected
    )
    # Deterministic under re-execution.
    out2, _ = exhaustive.apply_stitch_batch(
        state, cand.cam_a, tids_dup, uv_dup, cand.ok, jnp.asarray(64.0)
    )
    np.testing.assert_array_equal(
        np.asarray(out.obs_uv), np.asarray(out2.obs_uv)
    )


def test_append_observations_duplicate_pids_lowest_slot_wins():
    """map_store.append_observations resolves duplicate point ids to the
    lowest feature slot (deterministic), instead of racing the scatter."""
    from sfm_mvs_tpu.models import map_store
    from sfm_mvs_tpu.utils.config import MapConfig

    Kj = jnp.asarray(np.diag([100.0, 100.0, 1.0]), jnp.float32)
    st = map_store.init_map(Kj, MapConfig(max_cameras=4, max_points=64))
    st, cam = map_store.append_camera(st, jnp.eye(3, 4))
    pts = jnp.asarray(np.random.default_rng(0).normal(size=(3, 3)), jnp.float32)
    st, pids = map_store.append_points(
        st, pts, jnp.zeros((3, 3)), jnp.ones((3,), bool)
    )
    point_ids = jnp.asarray([0, 1, 0, 2], jnp.int32)  # slot 2 duplicates 0
    uv = jnp.asarray(
        [[10.0, 10.0], [20.0, 20.0], [99.0, 99.0], [30.0, 30.0]], jnp.float32
    )
    st = map_store.append_observations(
        st, cam, point_ids, uv, jnp.ones((4,), bool)
    )
    got = np.asarray(st.obs_uv)[0, int(cam)]
    np.testing.assert_allclose(got, [10.0, 10.0])  # slot 0, not slot 2
    assert bool(np.asarray(st.obs_mask)[0, int(cam)])
    assert bool(np.asarray(st.obs_mask)[1, int(cam)])
    assert bool(np.asarray(st.obs_mask)[2, int(cam)])


def test_covisibility_retrieval(recon):
    """The covisibility matrix is symmetric-ish, adjacent pairs dominate,
    and retrieval returns gap>=min_gap covisible pairs only."""
    sfm, state, K = recon
    cnt = np.asarray(exhaustive.covisibility_matrix(state))
    n = int(np.asarray(state.cam_valid).sum())
    assert cnt.shape[0] >= n
    # Observed points project into their own camera: diagonal is maximal.
    for i in range(n):
        assert cnt[i, i] >= cnt[i].max() - 1
    pairs = exhaustive.retrieve_stitch_pairs(cnt, n, min_gap=3, min_covis=20)
    assert pairs, "expected at least one covisible pair on a 30-deg arc"
    for i, j in pairs:
        assert j - i >= 3
        assert cnt[i, j] >= 20
