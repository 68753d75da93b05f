"""Large-sequence stress benchmark (BASELINE.json config 4 scale).

A 250-frame sequence registered with SLIDING-WINDOW local BA
(ba.bundle_adjust_window) — a static-shape sub-problem over the last
Wc cameras x Wp point slots whose cost is independent of map capacity —
then a one-time finalize (compact + cull + global BA). This is the
scale-out answer to the round-2 collapse (2.1 frames/s at 120 cameras
with cadence-5 GLOBAL BA, whose dense-grid cost grows with BOTH map
axes).

Per-segment wall times are recorded to demonstrate the cost model:
frames/s must stay ~flat as the camera count grows (windowed BA), where
the round-2 configuration slowed down linearly in C.

    python benchmarks/large_scene.py            # 250 frames, 480x360
    LARGE_FRAMES=120 python benchmarks/large_scene.py

Writes artifacts/LARGE_SCENE_r03.json and prints a JSON summary line.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import json
import time

import numpy as np

N_FRAMES = int(os.environ.get("LARGE_FRAMES", "250"))
BA_CADENCE = int(os.environ.get("LARGE_BA_CADENCE", "1"))
MAX_CAMS = int(os.environ.get("LARGE_MAX_CAMS", "256"))
MAX_POINTS = int(os.environ.get("LARGE_MAX_POINTS", "131072"))
SEGMENT = 25  # frames per timing segment (host sync only at boundaries)


def main():
    import jax

    # Honor JAX_PLATFORMS under the sitecustomize axon default (the env
    # var alone is too late; config updates before first backend use work).
    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
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
    # Arc scaled with frame count so per-step parallax stays at the
    # round-2 level (70 deg / 120 frames = 0.58 deg/step).
    arc = min(0.58 * N_FRAMES, 170.0)
    t0 = time.time()
    imgs, Rt_gt, K = render_staircase_sequence(
        num_cameras=N_FRAMES, image_size=(W, H), focal=focal,
        radius=9.0, arc_degrees=arc, num_strips=12, depth_spread=2.0,
    )
    print(f"rendered {N_FRAMES} frames ({arc:.0f} deg arc) in "
          f"{time.time()-t0:.1f}s", file=sys.stderr)

    cfg = SfmConfig(
        fx=focal, fy=focal, cx=W / 2, cy=H / 2, downscale=1,
        frontend=FrontendConfig(
            max_features=2048, num_octaves=4, upsample_input=True,
            contrast_threshold=0.012, lowe_ratio=0.75,
        ),
        ransac=RansacConfig(essential_iters=1024, pnp_iters=1024),
        map=MapConfig(max_cameras=MAX_CAMS, max_points=MAX_POINTS),
    )
    Kj = jnp.asarray(cfg.intrinsic_matrix())
    stack8 = jax.device_put(np.stack([(g * 255).astype(np.uint8) for g in imgs]))

    def detect(img8):
        return sift.detect_and_compute(img8.astype(jnp.float32) / 255.0, cfg.frontend)

    def bgr(img8):
        return jnp.repeat(img8[..., None], 3, -1).astype(jnp.float32)

    wp = min(16_384, MAX_POINTS)

    def window_ba(state):
        state, _ = ba.bundle_adjust_window(
            state, window_cams=24, window_points=wp,
            max_iterations=6, cg_iters=12,
        )
        return state

    key = jax.random.PRNGKey(0)
    keys = jax.random.split(key, N_FRAMES + 1)
    t0 = time.time()
    f0, f1, f2 = detect(stack8[0]), detect(stack8[1]), detect(stack8[2])
    pstate, _ = init_from_bootstrap(keys[0], f0, f1, bgr(stack8[1]), Kj, cfg)
    track1 = pstate.prev_track  # frame 1's feature-slot -> point-id map
    # Warmup frame (compiles register_frame + windowed BA), not timed.
    pstate, _ = register_frame(keys[2], pstate, f2, bgr(stack8[2]), cfg)
    pstate = pstate._replace(map=window_ba(pstate.map))
    jax.block_until_ready(pstate.map.points)
    print(f"compile+bootstrap {time.time()-t0:.1f}s", file=sys.stderr)

    # Per-frame features + track vectors kept (device arrays) for the
    # post-run stride-stitch; ~2048 slots x 250 frames is a few hundred MB.
    feats_kept = {1: f1, 2: f2}
    tracks_kept = {1: track1, 2: pstate.prev_track}

    t0 = time.time()
    seg_t = t0
    segments = []  # (last_frame, frames/s within segment)
    for i in range(3, N_FRAMES):
        f = detect(stack8[i])
        pstate, st = register_frame(keys[i], pstate, f, bgr(stack8[i]), cfg)
        if i % BA_CADENCE == 0:
            pstate = pstate._replace(map=window_ba(pstate.map))
        feats_kept[i] = f
        tracks_kept[i] = pstate.prev_track
        if (i - 1) % SEGMENT == 0 or i == N_FRAMES - 1:
            jax.block_until_ready(pstate.map.points)
            now = time.time()
            segments.append(
                {"through_frame": i, "fps": round(SEGMENT / max(now - seg_t, 1e-9), 2)}
            )
            seg_t = now
    jax.block_until_ready(pstate.map.points)
    elapsed = time.time() - t0

    # --- One-time finalize ---
    # (a) Stride-stitch: adjacent-frame-only observations cannot anchor a
    # 145-degree arc globally (the map is internally consistent but BENT:
    # round-3 first run reached 250/250 cams at rms 0.35px yet ATE 1.9%).
    # Inject re-observations along pairs (i, i+s) for s in STITCH_STRIDES
    # — existing loop-closure machinery (exhaustive.inject_reobservations)
    # — creating medium/long-range track links the global BA can pull on.
    from sfm_mvs_tpu.models import exhaustive
    from sfm_mvs_tpu.models.refine import finalize_map

    t_fin = time.time()
    state = pstate.map

    # Stitch matches are verified by pair-local E-RANSAC (drift-
    # independent) with a loose 64px map gate: the default map-agreement
    # gate rejected every match that exposed the accumulated bend (first
    # 250-frame run: ATE 1.9% pre-stitch, 1.66% with map-gated stitch —
    # the bend was invisible to the global BA by construction).
    # Pairs go through inject_reobservations_batch in fixed-size chunks
    # (one compiled program, pair loop on-device): the sequential
    # per-pair version paid tunnel RPC latency 2400x = 335 s wall.
    STITCH_STRIDES = (4, 8, 16, 32, 64)
    STITCH_ROUNDS = 2
    BATCH = 32

    frames = [i for i in range(1, N_FRAMES) if i in tracks_kept]
    frame_row = {f: r for r, f in enumerate(frames)}
    all_feats = jax.tree_util.tree_map(
        lambda *l: jnp.stack(l), *[feats_kept[i] for i in frames]
    )
    all_tracks = jnp.stack([tracks_kept[i] for i in frames])

    def stitch_pass(state, skey):
        # Both directions per pair: (i -> i+s) injects into camera i+s,
        # the swap injects into camera i — without it the last s frames
        # of each stride never receive long-range observations and the
        # arc ends stay the weakest-constrained cameras (measured: the
        # end cameras carry ~3x the median aligned position error).
        total = 0
        for s in STITCH_STRIDES:
            base = [i for i in range(1, N_FRAMES - s, 2)
                    if i in frame_row and (i + s) in frame_row]
            for src, dst in ((base, [i + s for i in base]),
                             ([i + s for i in base], base)):
                for c0 in range(0, len(src), BATCH):
                    chunk_s = src[c0 : c0 + BATCH]
                    chunk_d = dst[c0 : c0 + BATCH]
                    nb = len(chunk_s)
                    chunk_s = chunk_s + [chunk_s[-1]] * (BATCH - nb)
                    chunk_d = chunk_d + [chunk_d[-1]] * (BATCH - nb)
                    rows_s = np.asarray([frame_row[f] for f in chunk_s])
                    skey, kb = jax.random.split(skey)
                    state, counts = exhaustive.inject_reobservations_batch(
                        state,
                        jnp.asarray(chunk_d, jnp.int32),
                        jax.tree_util.tree_map(lambda a: a[rows_s], all_feats),
                        jax.tree_util.tree_map(
                            lambda a: a[np.asarray([frame_row[f] for f in chunk_d])],
                            all_feats,
                        ),
                        all_tracks[rows_s],
                        jnp.arange(BATCH) < nb,
                        cfg,
                        jax.random.split(kb, BATCH),
                        max_err_px=64.0,
                        epipolar_verify=True,
                    )
                    total += int(counts.sum())
        return state, total, skey

    # Camera id of frame i: bootstrap pair (0,1) -> cams (0,1), frame i>=2
    # -> cam i (all frames registered; verified below before trusting ids).
    all_registered = int(np.asarray(pstate.map.cam_valid).sum()) == N_FRAMES
    n_injected = []
    skey = jax.random.PRNGKey(7)
    if all_registered:
        # Stitch <-> robust-BA alternation. One pass is NOT enough: on the
        # raw windowed-registration map (measured ATE ~10% at 250 frames)
        # most long-stride matches misproject beyond any sane gate, so the
        # first pass only injects the survivors (enough for robust BA to
        # reach ~1.3%); re-stitching on the straightened geometry admits
        # the rest, and the next BA pulls further (measured on the saved
        # pre-finalize state: 400 extra LM iters WITHOUT re-stitching stay
        # flat at 1.25% — the constraint graph, not LM depth, binds).
        for r in range(STITCH_ROUNDS):
            state, n, skey = stitch_pass(state, skey)
            n_injected.append(n)
            state, stats = ba.bundle_adjust_map(
                state, max_iterations=50, cg_iters=30, huber_delta=3.0,
            )
            print(f"stitch round {r}: +{n} obs, robust cost "
                  f"{float(stats.final_cost):.4f}", file=sys.stderr)
    stitch_wall = time.time() - t_fin
    print(f"stitch: {n_injected} obs injected in {stitch_wall:.1f}s", file=sys.stderr)

    # (b) compact (BA cost is capacity-proportional on the dense grid) ->
    # cull + plain global BA polish.
    state, _ = map_store.compact_points(state)
    live = int(state.num_points)
    cap = 1024
    while cap < int(1.25 * live):
        cap *= 2
    state = map_store.shrink_map(state, cap)
    if os.environ.get("LARGE_SAVE_STATE"):
        from sfm_mvs_tpu.utils import checkpoint as ckpt
        ckpt.save_map(os.environ["LARGE_SAVE_STATE"], state)
    state, fin = finalize_map(state, max_iterations=15)
    fin_wall = time.time() - t_fin

    n_cams = int(np.asarray(state.cam_valid).sum())
    poses = np.asarray(state.poses)[np.asarray(state.cam_valid)]
    ate = (
        evaluate.ate_rmse(poses, Rt_gt[:n_cams])
        if n_cams == N_FRAMES
        else float("nan")
    )
    # Normalize explicitly: raw ATE is in ground-truth scene units; the
    # usual relative metric divides by the trajectory path length.
    gt_c = evaluate.camera_centers(Rt_gt[:n_cams])
    path_len = float(np.sum(np.linalg.norm(np.diff(gt_c, axis=0), axis=1)))
    result = {
        "metric": "large_scene_sfm",
        "frames": N_FRAMES,
        "arc_degrees": round(arc, 1),
        "resolution": [W, H],
        "ba": {
            "mode": "windowed",
            "window_cams": 24,
            "window_points": wp,
            "cadence": BA_CADENCE,
            "iters": 6,
        },
        "frames_per_s": round((N_FRAMES - 3) / elapsed, 3),
        "segments": segments,
        "cameras": n_cams,
        "points": live,
        "observations": int(map_store.num_observations(state)),
        "ate": round(float(ate), 5),
        "ate_units": "ground-truth scene units (camera orbit radius 9.0)",
        "gt_path_length": round(path_len, 2),
        "ate_pct_of_path": round(100.0 * float(ate) / path_len, 4),
        "stitch": {
            "strides": list(STITCH_STRIDES),
            "rounds": STITCH_ROUNDS,
            "injected_obs_per_round": n_injected,
            "wall_s": round(stitch_wall, 1),
        },
        "finalize": fin,
        "finalize_wall_s": round(fin_wall, 1),
        "cost_model": (
            "windowed BA evaluates a fixed (Wp, 24) sub-grid per call "
            "(O(Wp*Wc), capacity-independent); segment fps flat vs camera "
            "count is the evidence. Global-grid BA (round 2) was O(P*C) "
            "per call: 2.1 fps at C=120."
        ),
    }
    os.makedirs(os.path.join(os.path.dirname(__file__), "..", "artifacts"), exist_ok=True)
    with open(
        os.path.join(os.path.dirname(__file__), "..", "artifacts", "LARGE_SCENE_r03.json"),
        "w",
    ) as fh:
        json.dump(result, fh, indent=1)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
