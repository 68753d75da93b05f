"""Real-texture validation (CPU slice of benchmarks/quality_realtex.py).

The staircase renderer textured with the reference's one shipped
photograph (/root/reference/image.jpg) exercises the detector/matcher on
REAL contrast and gradient statistics — the synthetic value-noise textures
every other end-to-end test uses are friendlier than real imagery
(reference validation is real photos only, README.md:14,30).
"""

import os

import numpy as np
import pytest

import jax.numpy as jnp

from sfm_mvs_tpu.utils.config import (
    FrontendConfig, MapConfig, RansacConfig, SfmConfig,
)
from sfm_mvs_tpu.utils.synthetic import load_image_texture, render_staircase_sequence

REF_IMAGE = "/root/reference/image.jpg"

pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(
        not os.path.exists(REF_IMAGE), reason="reference image not present"
    ),
]


@pytest.fixture(scope="module")
def realtex_frames():
    tex = load_image_texture(REF_IMAGE, 512)
    imgs, Rt, K = render_staircase_sequence(
        num_cameras=4, arc_degrees=18, image_size=(320, 240), focal=400.0,
        depth_spread=2.0, texture=tex,
    )
    return imgs, Rt, K


def _cfg():
    return SfmConfig(
        fx=400.0, fy=400.0, cx=160.0, cy=120.0, downscale=1,
        frontend=FrontendConfig(
            max_features=1024, num_octaves=3, upsample_input=True,
            contrast_threshold=0.015, lowe_ratio=0.75,
        ),
        ransac=RansacConfig(essential_iters=1024, pnp_iters=512),
        map=MapConfig(max_cameras=8, max_points=8192),
    )


def test_two_view_on_real_texture(realtex_frames):
    """Bootstrap on real-texture frames recovers the true relative pose."""
    import jax

    from sfm_mvs_tpu.models.two_view import bootstrap
    from sfm_mvs_tpu.ops import sift
    from sfm_mvs_tpu.utils import evaluate

    imgs, Rt_gt, K = realtex_frames
    cfg = _cfg()
    f0 = sift.detect_and_compute(jnp.asarray(imgs[0]), cfg.frontend)
    f1 = sift.detect_and_compute(jnp.asarray(imgs[2]), cfg.frontend)
    assert int(np.asarray(f0.valid).sum()) > 200  # real texture yields features
    tv = bootstrap(jax.random.PRNGKey(0), f0, f1, jnp.asarray(K), cfg)
    assert int(tv.num_inliers) > 50
    est = np.stack([np.asarray(tv.pose0), np.asarray(tv.pose1)])
    rot = evaluate.rotation_errors_deg(est, Rt_gt[[0, 2]])
    assert rot.max() < 1.0, f"rotation error {rot.max():.3f} deg on real texture"


def test_pipeline_survives_photometric_nuisances(realtex_frames):
    """Exposure drift + sensor noise + blur, all at once (the round-4
    nuisance grid of benchmarks/quality_realtex.py), must not break the
    PIPELINE on real texture: all frames register, ATE < 1% of scene
    scale, rotations < 1.5 deg.

    Pipeline-level deliberately: an ISOLATED small-baseline two-view
    bootstrap under 0.8 px blur is genuinely seed-fragile (the widened
    localization noise lets a wrong essential matrix collect as many
    2 px inliers as the true one — measured 13.9 deg on pair (0,2) for
    3/5 seeds), but the incremental loop's PnP-against-the-map + per
    -frame refit absorbs it (measured: combined nuisance gives ATE
    0.13%, rot 0.36 deg on the 5-frame run)."""
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from benchmarks.quality_realtex import apply_nuisance
    from sfm_mvs_tpu.models.incremental import IncrementalSfM
    from sfm_mvs_tpu.utils import evaluate

    imgs, Rt_gt, K = realtex_frames
    spec = {"gain_lo": 0.75, "gain_hi": 1.25, "sigma": 0.015, "sigma_px": 0.8}
    imgs_n = apply_nuisance(list(imgs), spec)
    sfm = IncrementalSfM(_cfg())
    state = sfm.run(imgs_n)
    pv = np.asarray(state.cam_valid)
    assert int(pv.sum()) == len(imgs_n)
    poses = np.asarray(state.poses)[pv]
    scene_scale = float(
        np.linalg.norm(evaluate.camera_centers(Rt_gt), axis=1).mean()
    )
    ate = float(evaluate.ate_rmse(poses, Rt_gt)) / scene_scale
    rot = evaluate.rotation_errors_deg(poses, Rt_gt)
    assert ate < 0.01, f"ATE {ate:.4f} of scene scale under nuisances"
    assert rot.max() < 1.5, f"rotation {rot.max():.3f} deg under nuisances"


def test_match_yield_vs_cv2_on_real_texture(realtex_frames):
    """Our frontend's ratio-surviving match yield is within a sane factor
    of cv2's on the same real-texture frames (cv2 = test oracle only)."""
    cv2 = pytest.importorskip("cv2")

    from sfm_mvs_tpu.ops import matching, sift

    imgs, _, _ = realtex_frames
    cfg = _cfg()
    g0, g1 = imgs[0], imgs[1]

    f0 = sift.detect_and_compute(jnp.asarray(g0), cfg.frontend)
    f1 = sift.detect_and_compute(jnp.asarray(g1), cfg.frontend)
    m = matching.match_with_config(f0.desc, f1.desc, f0.valid, f1.valid, cfg.frontend)
    ours = int(np.asarray(m.valid).sum())

    s = cv2.SIFT_create(nfeatures=1024)
    k0, d0 = s.detectAndCompute((g0 * 255).astype(np.uint8), None)
    k1, d1 = s.detectAndCompute((g1 * 255).astype(np.uint8), None)
    bf = cv2.BFMatcher()
    good = [
        a for a, b in bf.knnMatch(d0, d1, k=2)
        if a.distance < cfg.frontend.lowe_ratio * b.distance
    ]
    theirs = len(good)
    assert theirs > 0
    assert ours > 0.3 * theirs, f"match yield {ours} vs cv2 {theirs}"
