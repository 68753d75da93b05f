"""Map refinement: outlier-point culling + final global bundle adjustment.

The reference's only cleaning is the export-time centroid-distance cut
(sfm.py:176-181). Proper SfM practice (and what keeps long sequences
tight) is geometric: drop observations whose reprojection error exceeds a
threshold, drop points left with fewer than two supporting observations,
then run a final global BA. All grid-shaped masked math — one jitted call.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from sfm_mvs_tpu.models import ba as ba_mod
from sfm_mvs_tpu.models.map_store import MapState


@partial(jax.jit, static_argnames=())
def cull_map(state: MapState, max_error_px: float = 4.0, min_track: int = 2) -> MapState:
    """Invalidate bad observations and under-supported points.

    - observation (p, c) is dropped when its reprojection error exceeds
      `max_error_px`;
    - point p is dropped when fewer than `min_track` observations remain.
    """
    prob = ba_mod.problem_from_map(state)
    r = ba_mod._res_grid(prob.cam_params, prob.points, prob.obs_uv, prob.K)
    err = jnp.linalg.norm(r, axis=-1)  # (P, C)
    w = ba_mod._weights(prob) > 0
    obs_ok = w & (err < max_error_px)
    track_len = jnp.sum(obs_ok.astype(jnp.int32), axis=1)
    point_ok = state.point_valid & (track_len >= min_track)
    return state._replace(
        obs_mask=obs_ok & point_ok[:, None],
        point_valid=point_ok,
    )


def finalize_map(
    state: MapState,
    max_iterations: int = 20,
    cull_px: float = 4.0,
    rounds: int = 2,
    robust_iterations: int = 0,
    robust_huber_px: float = 3.0,
    cg_iters: int = 20,
    merge_eps_3d: float = 0.0,
    merge_px: float = 4.0,
) -> tuple[MapState, dict]:
    """Cull -> global BA, repeated `rounds` times (the final polish).

    robust_iterations > 0 prepends a RELAXATION phase: Huber-robustified
    global BA run BEFORE any cull. On a drifted map the long-range
    (loop-closure / stitch) observations carry large reprojection errors;
    culling first would delete exactly the constraints that localize the
    drift. The robust phase lets them pull the trajectory straight with
    bounded influence, after which the normal cull->BA rounds clean up.

    merge_eps_3d > 0 additionally collapses DUPLICATE landmarks (two
    track chains of the same physical point, re-associated by a loop
    closure) via map_store.merge_duplicate_points, run twice (pairs ->
    clusters) after the robust phase so duplicates straightened into
    agreement unite before the cull rounds.
    """
    from sfm_mvs_tpu.models import map_store

    info = {}
    if robust_iterations > 0:
        state, stats = ba_mod.bundle_adjust_map(
            state, max_iterations=robust_iterations, cg_iters=cg_iters,
            huber_delta=robust_huber_px,
        )
        info["robust_cost"] = float(stats.final_cost)
    if merge_eps_3d > 0.0:
        n_total = 0
        remap_total = None
        for _ in range(2):
            state, remap, n = map_store.merge_duplicate_points(
                state, jnp.asarray(merge_eps_3d), jnp.asarray(merge_px)
            )
            n_total += int(n)
            remap_total = (
                remap if remap_total is None else remap[remap_total]
            )
        info["merged_points"] = n_total
        # Composed point-id remap (remap[i] = surviving id, identity for
        # unmerged). Callers holding external track vectors MUST re-point
        # them at the survivors (advisor r4: the driver's _cam_tracks
        # kept referencing merged-away ids). Popped before JSON logging.
        info["point_remap"] = remap_total
    for r in range(rounds):
        state = cull_map(state, max_error_px=cull_px)
        state, stats = ba_mod.bundle_adjust_map(
            state, max_iterations=max_iterations, cg_iters=cg_iters,
        )
        info[f"round{r}_cost"] = float(stats.final_cost)
    info["points"] = int(jnp.sum(state.point_valid))
    return state, info
