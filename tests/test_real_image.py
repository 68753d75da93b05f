"""Validation on the reference's shipped real photograph.

The reference repo ships one Gustav frame (image.jpg, 1936x1296). We use
it as real-texture test data: detector sanity vs cv2.SIFT on the same
pixels, and a full two-view pose recovery on a homography-warped pair
(known ground-truth homography).
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sfm_mvs_tpu.ops import matching, ransac, sift
from sfm_mvs_tpu.ops.homography import apply_homography
from sfm_mvs_tpu.utils.config import FrontendConfig

_IMG = "/root/reference/image.jpg"

pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(
        not os.path.exists(_IMG), reason="reference image not available"
    ),
]

CFG = FrontendConfig(
    max_features=2048, num_octaves=4, upsample_input=True,
    contrast_threshold=0.012,
)


@pytest.fixture(scope="module")
def gray():
    from sfm_mvs_tpu.utils import io
    from sfm_mvs_tpu.ops import pyramid

    g = io.load_image_gray(_IMG)
    # downscale=4 keeps CPU test time reasonable (484x324)
    g = np.asarray(pyramid.img_downscale(jnp.asarray(g), 4))
    return g


def test_detector_count_comparable_to_cv2(gray):
    cv2 = pytest.importorskip("cv2")
    f = sift.detect_and_compute(jnp.asarray(gray), CFG)
    ours = int(np.asarray(f.valid).sum())
    s = cv2.SIFT_create(contrastThreshold=0.012, nOctaveLayers=3)
    kp = s.detect((gray * 255).astype(np.uint8), None)
    # Both upsample; cv2 additionally duplicates multi-orientation
    # keypoints (~+25%). Measured on this image: ours 1208 vs cv2 1276.
    assert ours > 0.7 * len(kp)
    assert ours > 500


def test_warped_pair_matching_and_homography(gray):
    """Warp the real photo by a known homography; recover it end-to-end."""
    H_true = np.array(
        [[0.98, 0.04, 12.0], [-0.03, 1.01, -8.0], [1e-5, -2e-5, 1.0]],
        dtype=np.float64,
    )
    h, w = gray.shape
    # inverse-warp render of the second view
    ys, xs = np.mgrid[0:h, 0:w].astype(np.float64)
    pix = np.stack([xs, ys, np.ones_like(xs)], -1).reshape(-1, 3)
    src = pix @ np.linalg.inv(H_true).T
    sx = src[:, 0] / src[:, 2]
    sy = src[:, 1] / src[:, 2]
    inside = (sx >= 0) & (sx < w - 1) & (sy >= 0) & (sy < h - 1)
    x0 = np.clip(np.floor(sx).astype(int), 0, w - 2)
    y0 = np.clip(np.floor(sy).astype(int), 0, h - 2)
    fx = (sx - x0).astype(np.float32)
    fy = (sy - y0).astype(np.float32)
    g2 = (
        gray[y0, x0] * (1 - fy) * (1 - fx)
        + gray[y0, x0 + 1] * (1 - fy) * fx
        + gray[y0 + 1, x0] * fy * (1 - fx)
        + gray[y0 + 1, x0 + 1] * fy * fx
    )
    g2 = np.where(inside, g2, 0.0).reshape(h, w).astype(np.float32)

    f0 = sift.detect_and_compute(jnp.asarray(gray), CFG)
    f1 = sift.detect_and_compute(jnp.asarray(g2), CFG)
    m = matching.knn_match(f0.desc, f1.desc, f0.valid, f1.valid, ratio=0.75)
    p0, p1, mv = matching.gather_match_points(f0.xy, f1.xy, m)
    n_matches = int(np.asarray(mv).sum())
    assert n_matches > 100

    res = ransac.ransac_homography(
        jax.random.PRNGKey(0), p0, p1, mv, threshold_px=2.0, iters=512
    )
    assert int(res.num_inliers) > 0.7 * n_matches
    H_est = np.array(res.model)
    H_est = H_est / H_est[2, 2]
    # compare by corner transfer error
    corners = np.array([[0, 0], [w - 1, 0], [0, h - 1], [w - 1, h - 1]], np.float32)
    t_est = np.asarray(apply_homography(jnp.asarray(H_est.astype(np.float32)), jnp.asarray(corners)))
    ch = corners @ H_true[:2, :2].T  # full projective transfer:
    hom = np.concatenate([corners, np.ones((4, 1), np.float32)], 1) @ H_true.T
    t_true = hom[:, :2] / hom[:, 2:3]
    assert np.abs(t_est - t_true).max() < 1.5  # px
