"""SIFT-style detector/descriptor: localization, repeatability, end-to-end."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sfm_mvs_tpu.ops import epipolar, matching, projection, pyramid, ransac, sift
from sfm_mvs_tpu.utils.config import FrontendConfig
from sfm_mvs_tpu.utils.synthetic import render_staircase_sequence

CFG = FrontendConfig(
    max_features=1024, num_octaves=3, upsample_input=True, contrast_threshold=0.015
)


def _blob_image(H=128, W=160, cx=80.5, cy=60.5, sigma=3.0):
    y, x = np.mgrid[0:H, 0:W].astype(np.float32)
    img = np.exp(-((x - cx) ** 2 + (y - cy) ** 2) / (2 * sigma**2))
    return img.astype(np.float32)


@pytest.mark.slow
def test_detects_single_blob_at_location():
    img = _blob_image()
    f = sift.detect_and_compute(jnp.asarray(img), CFG)
    v = np.asarray(f.valid)
    assert v.sum() >= 1
    xy = np.asarray(f.xy)[v]
    # strongest keypoint should be at the blob center
    best = np.asarray(f.response)[v].argmax()
    assert abs(xy[best, 0] - 80.5) < 1.0
    assert abs(xy[best, 1] - 60.5) < 1.0
    # DoG responds at scale ~ blob sigma (loose factor-of-2 check)
    s = np.asarray(f.scale)[v][best]
    assert 1.5 < s < 6.5


@pytest.mark.slow
def test_descriptor_norm_and_validity():
    imgs, _, _ = render_staircase_sequence(num_cameras=1)
    f = sift.detect_and_compute(jnp.asarray(imgs[0]), CFG)
    v = np.asarray(f.valid)
    assert v.sum() > 100
    norms = np.linalg.norm(np.asarray(f.desc)[v], axis=1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-4)
    # descriptor clipped at 0.2 then renormalized -> max entry bounded
    assert np.asarray(f.desc)[v].max() <= 0.2 / np.sqrt(0.2**2) + 1e-5
    xy = np.asarray(f.xy)[v]
    assert (xy >= 0).all() and (xy[:, 0] < 320).all() and (xy[:, 1] < 240).all()


def test_invalid_slots_zero_response():
    img = _blob_image()  # few features -> most slots invalid
    f = sift.detect_and_compute(jnp.asarray(img), CFG)
    inv = ~np.asarray(f.valid)
    assert (np.asarray(f.response)[inv] == 0.0).all()


def test_repeatability_across_views():
    """Features detected in view 0 should match to view 1 consistently."""
    imgs, Rt, K = render_staircase_sequence(num_cameras=2, arc_degrees=10)
    f0 = sift.detect_and_compute(jnp.asarray(imgs[0]), CFG)
    f1 = sift.detect_and_compute(jnp.asarray(imgs[1]), CFG)
    m = matching.knn_match(f0.desc, f1.desc, f0.valid, f1.valid, ratio=0.75)
    n_match = int(np.asarray(m.valid).sum())
    n_kp = int(np.asarray(f0.valid).sum())
    assert n_kp > 150
    assert n_match > 0.25 * n_kp  # decent cross-view match rate


@pytest.mark.slow
def test_end_to_end_pose_from_rendered_views():
    """detect -> match -> E-RANSAC -> recoverPose reproduces ground truth."""
    imgs, Rt, K = render_staircase_sequence(num_cameras=2, arc_degrees=10)
    f0 = sift.detect_and_compute(jnp.asarray(imgs[0]), CFG)
    f1 = sift.detect_and_compute(jnp.asarray(imgs[1]), CFG)
    m = matching.knn_match(f0.desc, f1.desc, f0.valid, f1.valid, ratio=0.75)
    p0, p1, mv = matching.gather_match_points(f0.xy, f1.xy, m)
    Kj = jnp.asarray(K)
    n0 = projection.normalize_points(p0, Kj)
    n1 = projection.normalize_points(p1, Kj)
    res = ransac.ransac_essential(
        jax.random.PRNGKey(0), n0, n1, mv, Kj[0, 0], threshold_px=1.5, iters=1024
    )
    assert int(res.num_inliers) > 40
    R, t, _ = epipolar.recover_pose(res.model, n0, n1, res.inliers)
    R0, t0 = Rt[0, :, :3], Rt[0, :, 3]
    R1, t1 = Rt[1, :, :3], Rt[1, :, 3]
    R_rel = R1 @ R0.T
    t_rel = t1 - R_rel @ t0
    t_rel /= np.linalg.norm(t_rel)
    assert np.abs(np.asarray(R) - R_rel).max() < 0.02
    assert np.abs(np.asarray(t) - t_rel).max() < 0.03


def test_pyr_down_matches_cv2():
    cv2 = pytest.importorskip("cv2")
    rng = np.random.default_rng(0)
    img = rng.random((64, 80)).astype(np.float32)
    ours = np.asarray(pyramid.pyr_down(jnp.asarray(img)))
    theirs = cv2.pyrDown(img)
    assert ours.shape == theirs.shape
    # interior agrees (border handling differs: edge vs reflect)
    np.testing.assert_allclose(ours[2:-2, 2:-2], theirs[2:-2, 2:-2], atol=2e-3)


def test_gaussian_blur_matches_cv2():
    cv2 = pytest.importorskip("cv2")
    rng = np.random.default_rng(1)
    img = rng.random((64, 64)).astype(np.float32)
    ours = np.asarray(pyramid.gaussian_blur(jnp.asarray(img), 2.0))
    theirs = cv2.GaussianBlur(img, (13, 13), 2.0)
    # margin > kernel radius (6): border handling differs (edge vs reflect101)
    np.testing.assert_allclose(ours[7:-7, 7:-7], theirs[7:-7, 7:-7], atol=1e-5)
