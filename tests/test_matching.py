"""KNN matcher vs cv2.BFMatcher oracle, with masking semantics."""

import numpy as np
import pytest

import jax.numpy as jnp

from sfm_mvs_tpu.ops import matching

cv2 = pytest.importorskip("cv2")


def _random_descriptors(rng, n, d=128):
    desc = rng.random((n, d)).astype(np.float32)
    return desc / np.linalg.norm(desc, axis=1, keepdims=True)


def test_matches_cv2_bfmatcher(rng):
    desc0 = _random_descriptors(rng, 200)
    # make desc1 = shuffled noisy copies so real matches exist
    perm = rng.permutation(200)
    desc1 = desc0[perm] + 0.01 * rng.standard_normal((200, 128)).astype(np.float32)
    desc1 /= np.linalg.norm(desc1, axis=1, keepdims=True)

    valid = jnp.ones(200, dtype=bool)
    res = matching.knn_match(jnp.asarray(desc0), jnp.asarray(desc1), valid, valid, ratio=0.7)

    bf = cv2.BFMatcher()
    cv_matches = bf.knnMatch(desc0, desc1, k=2)
    cv_good = {}
    for m, n in cv_matches:
        if m.distance < 0.70 * n.distance:
            cv_good[m.queryIdx] = m.trainIdx

    ours_valid = np.asarray(res.valid)
    ours_idx1 = np.asarray(res.idx1)
    ours_good = {i: int(ours_idx1[i]) for i in range(200) if ours_valid[i]}
    # identical accept set and identical matched indices
    assert ours_good == cv_good
    assert len(ours_good) > 150  # noisy copies should mostly match


def test_ratio_test_rejects_ambiguous(rng):
    # two identical train descriptors -> d1 == d2 -> ratio test must reject
    q = _random_descriptors(rng, 4)
    train = np.vstack([q[0], q[0], q[1] + 0.3, q[2]]).astype(np.float32)
    train /= np.linalg.norm(train, axis=1, keepdims=True)
    valid = jnp.ones(4, dtype=bool)
    res = matching.knn_match(jnp.asarray(q), jnp.asarray(train), valid, valid, ratio=0.7)
    assert not bool(res.valid[0])  # ambiguous: two equal best matches


def test_invalid_train_columns_never_matched(rng):
    desc0 = _random_descriptors(rng, 32)
    desc1 = np.vstack([desc0[:16], desc0[:16]]).astype(np.float32)  # cols 16.. are dups
    valid0 = jnp.ones(32, dtype=bool)
    valid1 = jnp.asarray(np.arange(32) < 16)
    res = matching.knn_match(jnp.asarray(desc0), jnp.asarray(desc1), valid0, valid1)
    # with duplicate columns masked out, first 16 queries match uniquely
    assert np.asarray(res.valid)[:16].all()
    assert (np.asarray(res.idx1)[:16] == np.arange(16)).all()


def test_invalid_query_rows_not_valid(rng):
    desc0 = _random_descriptors(rng, 32)
    desc1 = desc0.copy()
    valid0 = jnp.asarray(np.arange(32) < 10)
    valid1 = jnp.ones(32, dtype=bool)
    res = matching.knn_match(jnp.asarray(desc0), jnp.asarray(desc1), valid0, valid1)
    assert not np.asarray(res.valid)[10:].any()


def test_mutual_check(rng):
    desc0 = _random_descriptors(rng, 64)
    desc1 = desc0 + 0.01 * rng.standard_normal((64, 128)).astype(np.float32)
    valid = jnp.ones(64, dtype=bool)
    res = matching.knn_match(
        jnp.asarray(desc0), jnp.asarray(desc1), valid, valid, mutual=True
    )
    assert np.asarray(res.valid).sum() > 50


def test_gather_match_points(rng):
    kp0 = jnp.asarray(rng.random((8, 2)).astype(np.float32))
    kp1 = jnp.asarray(rng.random((8, 2)).astype(np.float32))
    m = matching.Matches(
        idx0=jnp.arange(8, dtype=jnp.int32),
        idx1=jnp.asarray([1, 0, 3, 2, 5, 4, 7, 6], dtype=jnp.int32),
        valid=jnp.asarray([True] * 4 + [False] * 4),
    )
    p0, p1, v = matching.gather_match_points(kp0, kp1, m)
    np.testing.assert_allclose(np.asarray(p0[:4]), np.asarray(kp0[:4]))
    np.testing.assert_allclose(np.asarray(p1[0]), np.asarray(kp1[1]))
    np.testing.assert_allclose(np.asarray(p0[4:]), 0.0)
