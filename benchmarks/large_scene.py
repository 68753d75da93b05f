"""Large-sequence stress benchmark (BASELINE.json config 4 scale).

A 120-frame sequence with BA every 5 frames and checkpointing — exercises
capacity growth, cadence BA, the rejection guard and resume machinery at
several times the Gustav scale. Prints a JSON summary line.

    python benchmarks/large_scene.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import json
import time

import numpy as np

N_FRAMES = int(os.environ.get("LARGE_FRAMES", "120"))


def main():
    import jax
    import jax.numpy as jnp

    from sfm_mvs_tpu.models import ba, map_store
    from sfm_mvs_tpu.models.incremental import init_from_bootstrap, register_frame
    from sfm_mvs_tpu.ops import sift
    from sfm_mvs_tpu.utils import evaluate
    from sfm_mvs_tpu.utils.config import (
        FrontendConfig, MapConfig, RansacConfig, SfmConfig,
    )
    from sfm_mvs_tpu.utils.synthetic import render_staircase_sequence

    W, H = 480, 360
    focal = 600.0
    t0 = time.time()
    imgs, Rt_gt, K = render_staircase_sequence(
        num_cameras=N_FRAMES, image_size=(W, H), focal=focal,
        radius=9.0, arc_degrees=70.0, num_strips=12, depth_spread=2.0,
    )
    print(f"rendered {N_FRAMES} frames in {time.time()-t0:.1f}s", file=sys.stderr)

    cfg = SfmConfig(
        fx=focal, fy=focal, cx=W / 2, cy=H / 2, downscale=1,
        frontend=FrontendConfig(
            max_features=2048, num_octaves=4, upsample_input=True,
            contrast_threshold=0.012, lowe_ratio=0.75,
        ),
        ransac=RansacConfig(essential_iters=1024, pnp_iters=1024),
        map=MapConfig(max_cameras=128, max_points=65536),
    )
    Kj = jnp.asarray(cfg.intrinsic_matrix())
    stack8 = jax.device_put(np.stack([(g * 255).astype(np.uint8) for g in imgs]))

    def detect(img8):
        return sift.detect_and_compute(img8.astype(jnp.float32) / 255.0, cfg.frontend)

    def bgr(img8):
        return jnp.repeat(img8[..., None], 3, -1).astype(jnp.float32)

    key = jax.random.PRNGKey(0)
    keys = jax.random.split(key, N_FRAMES + 1)
    f0, f1 = detect(stack8[0]), detect(stack8[1])
    pstate, _ = init_from_bootstrap(keys[0], f0, f1, bgr(stack8[1]), Kj, cfg)
    jax.block_until_ready(pstate.map.points)

    t0 = time.time()
    accepted = 1
    for i in range(2, N_FRAMES):
        f = detect(stack8[i])
        pstate, st = register_frame(keys[i], pstate, f, bgr(stack8[i]), cfg)
        if i % 5 == 0:
            mstate, _ = ba.bundle_adjust_map(pstate.map, max_iterations=6, cg_iters=12)
            pstate = pstate._replace(map=mstate)
    jax.block_until_ready(pstate.map.points)
    elapsed = time.time() - t0

    # Final polish: cull + global BA (models/refine.py).
    from sfm_mvs_tpu.models.refine import finalize_map

    state, fin = finalize_map(pstate.map, max_iterations=15)
    n_cams = int(np.asarray(state.cam_valid).sum())
    poses = np.asarray(state.poses)[np.asarray(state.cam_valid)]
    ate = (
        evaluate.ate_rmse(poses, Rt_gt[:n_cams])
        if n_cams == N_FRAMES
        else float("nan")
    )
    result = {
        "metric": "large_scene_sfm",
        "frames": N_FRAMES,
        "frames_per_s": round((N_FRAMES - 2) / elapsed, 3),
        "cameras": n_cams,
        "points": int(state.num_points),
        "observations": int(map_store.num_observations(state)),
        "ate": round(float(ate), 5),
        "finalize": fin,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
