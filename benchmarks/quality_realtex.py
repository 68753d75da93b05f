"""Real-texture validation: the quality matrix on real image statistics.

Every other end-to-end number in this repo comes from synthetic value-noise
textures. The reference's only validation is real photographs (README.md:14,
30 — the 57-image Gustav II Adolf sequence, which is not shipped). This
benchmark narrows that gap: the staircase renderer is textured with the
PIXELS of the reference's one shipped photograph (`/root/reference/
image.jpg`, 1936x1296), so the detector/matcher run on real contrast and
gradient statistics while the geometry stays exactly known.

Three parts:
1. the 5-scenario quality matrix re-run on the real texture (ATE /
   rotation bounds),
2. a 20-frame end-to-end with per-frame BA + finalize,
3. detector/matcher statistics vs cv2 (test oracle) on the same frames:
   SIFT keypoint counts, ratio-surviving match yield, and two-view E
   inlier rates.

    python benchmarks/quality_realtex.py

Writes artifacts/QUALITY_realtex.json and prints it as one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

ART = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "artifacts")
REF_IMAGE = "/root/reference/image.jpg"

SCENARIOS = [
    {"name": "easy_wide", "arc": 24, "spread": 2.0, "size": (320, 240), "frames": 5},
    {"name": "small_baseline", "arc": 8, "spread": 2.0, "size": (320, 240), "frames": 5},
    {"name": "shallow_relief", "arc": 20, "spread": 0.8, "size": (320, 240), "frames": 5},
    {"name": "high_res", "arc": 24, "spread": 2.0, "size": (640, 480), "frames": 5},
    {"name": "long_arc", "arc": 60, "spread": 2.0, "size": (320, 240), "frames": 8},
]


def cv2_frontend_stats(imgs, lowe=0.75):
    """cv2-oracle statistics on the same frames: keypoints + match yield."""
    try:
        import cv2
    except Exception:
        return None
    sift = cv2.SIFT_create()
    kps, descs = [], []
    for g in imgs:
        k, d = sift.detectAndCompute((g * 255).astype(np.uint8), None)
        kps.append(k)
        descs.append(d)
    bf = cv2.BFMatcher()
    yields = []
    for i in range(len(imgs) - 1):
        if descs[i] is None or descs[i + 1] is None:
            yields.append(0)
            continue
        mm = bf.knnMatch(descs[i], descs[i + 1], k=2)
        good = [m for m, n in mm if m.distance < lowe * n.distance]
        yields.append(len(good))
    return {
        "kp_per_frame": round(float(np.mean([len(k) for k in kps])), 1),
        "matches_per_pair": round(float(np.mean(yields)), 1),
    }


def our_frontend_stats(imgs, cfg):
    import jax.numpy as jnp

    from sfm_mvs_tpu.ops import matching, sift

    feats = [sift.detect_and_compute(jnp.asarray(g), cfg.frontend) for g in imgs]
    counts = [int(np.asarray(f.valid).sum()) for f in feats]
    yields = []
    for i in range(len(imgs) - 1):
        m = matching.match_with_config(
            feats[i].desc, feats[i + 1].desc,
            feats[i].valid, feats[i + 1].valid, cfg.frontend,
        )
        yields.append(int(np.asarray(m.valid).sum()))
    return {
        "kp_per_frame": round(float(np.mean(counts)), 1),
        "matches_per_pair": round(float(np.mean(yields)), 1),
    }


def main():
    import jax

    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

    from sfm_mvs_tpu.models.incremental import IncrementalSfM
    from sfm_mvs_tpu.models.refine import finalize_map
    from sfm_mvs_tpu.utils import evaluate
    from sfm_mvs_tpu.utils.config import (
        FrontendConfig, MapConfig, RansacConfig, SfmConfig,
    )
    from sfm_mvs_tpu.utils.synthetic import load_image_texture, render_staircase_sequence

    tex = load_image_texture(REF_IMAGE, 1024)
    out = {"texture": REF_IMAGE, "texture_std": round(float(tex.std()), 4)}

    # --- 1. quality matrix on the real texture ---
    rows = []
    for sc in SCENARIOS:
        W, H = sc["size"]
        focal = 400.0 * W / 320.0
        imgs, Rt_gt, K = render_staircase_sequence(
            num_cameras=sc["frames"], arc_degrees=sc["arc"],
            depth_spread=sc["spread"], image_size=sc["size"], focal=focal,
            texture=tex,
        )
        cfg = SfmConfig(
            fx=focal, fy=focal, cx=W / 2, cy=H / 2, downscale=1,
            frontend=FrontendConfig(
                max_features=1024, num_octaves=3, upsample_input=True,
                contrast_threshold=0.015, lowe_ratio=0.75,
            ),
            ransac=RansacConfig(),
            map=MapConfig(max_cameras=16, max_points=16384),
        )
        sfm = IncrementalSfM(cfg)
        try:
            state = sfm.run(imgs)
            state, _ = finalize_map(state, max_iterations=10)
            pv = np.asarray(state.cam_valid)
            poses = np.asarray(state.poses)[pv]
            registered = int(pv.sum())
            scene_scale = float(
                np.linalg.norm(evaluate.camera_centers(Rt_gt), axis=1).mean()
            )
            row = {
                "scenario": sc["name"],
                "registered": f"{registered}/{sc['frames']}",
                "points": int(state.num_points),
            }
            if registered == sc["frames"]:
                ate = evaluate.ate_rmse(poses, Rt_gt)
                rot = evaluate.rotation_errors_deg(poses, Rt_gt)
                row["ate_rel"] = round(float(ate) / scene_scale, 5)
                row["rot_max_deg"] = round(float(rot.max()), 3)
            rows.append(row)
        except Exception as e:
            rows.append({"scenario": sc["name"], "error": str(e)[:120]})
        print(json.dumps(rows[-1]), file=sys.stderr)
    out["matrix"] = rows

    # --- 2. 20-frame end-to-end with per-frame BA + finalize ---
    W, H = 480, 360
    focal = 600.0
    imgs, Rt_gt, K = render_staircase_sequence(
        num_cameras=20, image_size=(W, H), focal=focal,
        radius=9.0, arc_degrees=24.0, num_strips=12, depth_spread=2.0,
        texture=tex,
    )
    from sfm_mvs_tpu.utils.config import BaConfig

    cfg = SfmConfig(
        fx=focal, fy=focal, cx=W / 2, cy=H / 2, downscale=1,
        frontend=FrontendConfig(
            max_features=2048, num_octaves=4, upsample_input=True,
            contrast_threshold=0.012, lowe_ratio=0.75,
        ),
        ransac=RansacConfig(essential_iters=1024, pnp_iters=1024),
        ba=BaConfig(enabled=True, max_iterations=8),
        map=MapConfig(max_cameras=32, max_points=32768),
    )
    t0 = time.time()
    sfm = IncrementalSfM(cfg)
    state = sfm.run(imgs)
    state, _ = finalize_map(state, max_iterations=15)
    wall = time.time() - t0
    pv = np.asarray(state.cam_valid)
    poses = np.asarray(state.poses)[pv]
    registered = int(pv.sum())
    e2e = {"registered": f"{registered}/20", "wall_s": round(wall, 1)}
    if registered == 20:
        scene_scale = float(
            np.linalg.norm(evaluate.camera_centers(Rt_gt), axis=1).mean()
        )
        ate = evaluate.ate_rmse(poses, Rt_gt)
        rot = evaluate.rotation_errors_deg(poses, Rt_gt)
        e2e["ate_rel"] = round(float(ate) / scene_scale, 5)
        e2e["rot_max_deg"] = round(float(rot.max()), 3)
        e2e["reproj_max"] = round(max(s["reproj_error"] for s in sfm.stats), 4)
    out["e2e_20frame"] = e2e
    print(json.dumps(e2e), file=sys.stderr)

    # --- 3. detector/matcher statistics vs cv2 on the same frames ---
    sample = imgs[:6]
    ours = our_frontend_stats(sample, cfg)
    theirs = cv2_frontend_stats(sample, lowe=cfg.frontend.lowe_ratio)
    out["frontend_ours"] = ours
    out["frontend_cv2"] = theirs
    if theirs and theirs["matches_per_pair"] > 0:
        out["match_yield_vs_cv2"] = round(
            ours["matches_per_pair"] / theirs["matches_per_pair"], 3
        )
    print(json.dumps({"ours": ours, "cv2": theirs}), file=sys.stderr)

    os.makedirs(ART, exist_ok=True)
    with open(os.path.join(ART, "QUALITY_realtex.json"), "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
