"""KLT-tracking incremental SfM: the front end the reference abandoned.

The reference's commented-out experiment (sfm.py:249-257) replaces
descriptor re-matching with Lucas-Kanade tracking between consecutive
frames. This module completes that design as a full pipeline variant:

- per frame, existing feature positions are TRACKED into the new image
  (ops/optical_flow.py) — no detection or matching on most frames;
- tracked features with 3D points drive PnP registration; tracked
  features without 3D are triangulated against the previous camera;
- lost tracks (occlusion, border exits, low texture) are replenished by
  re-detection every `redetect_every` frames, masked away from surviving
  tracks so capacity goes to new coverage.

Fixed-capacity slot semantics: slot i of the track table carries one
feature across frames until it dies; replenishment re-uses dead slots.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from sfm_mvs_tpu.models import map_store
from sfm_mvs_tpu.models.map_store import MapState
from sfm_mvs_tpu.models.two_view import bootstrap
from sfm_mvs_tpu.ops import optical_flow, projection, ransac, sift, triangulation
from sfm_mvs_tpu.utils.config import SfmConfig


class KltState(NamedTuple):
    map: MapState
    prev_gray: jnp.ndarray  # (H, W) previous frame
    positions: jnp.ndarray  # (S,) x (2,) current feature positions
    track_ids: jnp.ndarray  # (S,) 3D point id per slot (-1 = not yet)
    alive: jnp.ndarray  # (S,) slot carries a live feature


class KltStats(NamedTuple):
    num_tracked: jnp.ndarray
    num_pnp_inliers: jnp.ndarray
    num_new_points: jnp.ndarray
    reproj_error: jnp.ndarray


@partial(jax.jit, static_argnames=("cfg",))
def klt_step(
    key: jax.Array,
    state: KltState,
    new_gray: jnp.ndarray,
    cfg: SfmConfig,
) -> tuple[KltState, KltStats]:
    """Track -> register -> triangulate, one jitted program per frame."""
    rc = cfg.ransac
    m = state.map
    K = m.K

    # 1. Track all live slots into the new frame.
    flow = optical_flow.track_points(
        state.prev_gray, new_gray, state.positions, state.alive
    )
    pos = flow.points
    alive = flow.valid

    # 2. PnP on tracked slots that own 3D points.
    tids = state.track_ids
    safe = jnp.clip(tids, 0, m.points.shape[0] - 1)
    has3d = alive & (tids >= 0) & m.point_valid[safe]
    X = m.points[safe]
    uvn = projection.normalize_points(pos, K)
    k1, _ = jax.random.split(key)
    res = ransac.ransac_pnp(
        k1, X, pos, uvn, has3d, K,
        threshold_px=rc.pnp_threshold_px, iters=rc.pnp_iters,
        use_p3p=rc.pnp_use_p3p,
    )
    pose_new = res.model
    m, cam_new = map_store.append_camera(m, pose_new)
    prev_cam = cam_new - 1
    pose_prev = m.poses[prev_cam]
    m = map_store.append_observations(m, cam_new, tids, pos, res.inliers)

    # 3. Triangulate tracked slots without 3D (seen in both frames).
    fresh = alive & (tids < 0)
    X_new = triangulation.triangulate_euclidean(
        K @ pose_prev, K @ pose_new, state.positions, pos
    )
    d0, d1 = triangulation.triangulation_depths(pose_prev, pose_new, X_new)
    e0 = jnp.linalg.norm(
        projection.reprojection_residuals(X_new, state.positions, pose_prev, K), axis=-1
    )
    e1 = jnp.linalg.norm(
        projection.reprojection_residuals(X_new, pos, pose_new, K), axis=-1
    )
    good = fresh & (d0 > 0) & (d1 > 0) & (e0 < rc.pnp_threshold_px) & (e1 < rc.pnp_threshold_px)
    # grayscale intensity as the point color (BGR-replicated, like the
    # incremental pipeline does when no color image is supplied)
    Hh, Ww = new_gray.shape
    xi = jnp.clip(pos[:, 0].astype(jnp.int32), 0, Ww - 1)
    yi = jnp.clip(pos[:, 1].astype(jnp.int32), 0, Hh - 1)
    gval = new_gray[yi, xi] * 255.0
    colors = jnp.stack([gval, gval, gval], axis=-1)
    m, pids = map_store.append_points(m, X_new, colors, good)
    m = map_store.append_observations(m, prev_cam, pids, state.positions, good)
    m = map_store.append_observations(m, cam_new, pids, pos, good)
    tids = jnp.where(good, pids.astype(jnp.int32), tids)
    # Slots that failed PnP inlier check but tracked keep their id (they
    # may re-enter later); slots that died lose it.
    tids = jnp.where(alive, tids, -1)

    err = projection.masked_mean_reprojection_error(X, pos, pose_new, K, res.inliers)
    accepted = res.num_inliers >= rc.min_pnp_inliers
    new_state = KltState(
        map=m, prev_gray=new_gray, positions=pos, track_ids=tids, alive=alive
    )
    out = jax.tree_util.tree_map(
        lambda new, old: jnp.where(accepted, new, old),
        new_state,
        state._replace(prev_gray=new_gray),
    )
    stats = KltStats(
        num_tracked=jnp.sum(alive),
        num_pnp_inliers=res.num_inliers,
        num_new_points=jnp.where(accepted, jnp.sum(good), 0),
        reproj_error=err,
    )
    return out, stats


@partial(jax.jit, static_argnames=("cfg",))
def replenish(state: KltState, feats: sift.Features, cfg: SfmConfig, min_dist: float = 8.0) -> KltState:
    """Fill dead slots with freshly detected keypoints away from live tracks.

    feats: detection on the CURRENT frame (state.prev_gray's frame).
    """
    S = state.positions.shape[0]
    # distance of each candidate to the nearest live track
    live_pos = jnp.where(state.alive[:, None], state.positions, 1e9)
    d2 = (
        jnp.sum(feats.xy**2, axis=1, keepdims=True)
        + jnp.sum(live_pos**2, axis=1)[None, :]
        - 2.0 * feats.xy @ live_pos.T
    )
    dmin = jnp.min(d2, axis=1)
    cand = feats.valid & (dmin > min_dist**2)
    # order candidates by response; assign to dead slots
    order = jnp.argsort(jnp.where(cand, -feats.response, 1e9))
    dead_order = jnp.argsort(state.alive.astype(jnp.int32), stable=True)  # dead first
    n_dead = jnp.sum(~state.alive)
    take = jnp.arange(S) < jnp.minimum(n_dead, jnp.sum(cand))
    src = order[: S]
    dst = dead_order[: S]
    new_pos = state.positions.at[dst].set(
        jnp.where(take[:, None], feats.xy[src], state.positions[dst])
    )
    new_alive = state.alive.at[dst].set(
        jnp.where(take, cand[src], state.alive[dst])
    )
    new_tids = state.track_ids.at[dst].set(
        jnp.where(take, -1, state.track_ids[dst])
    )
    return state._replace(positions=new_pos, alive=new_alive, track_ids=new_tids)


class KltSfM:
    """Host driver for the KLT-tracking pipeline variant."""

    def __init__(self, config: Optional[SfmConfig] = None, redetect_every: int = 5):
        self.config = config or SfmConfig()
        self.redetect_every = redetect_every
        self.stats: list[dict] = []

    def run(self, images_gray: Sequence[np.ndarray], seed: int = 0) -> MapState:
        cfg = self.config
        K = jnp.asarray(cfg.intrinsic_matrix())
        key = jax.random.PRNGKey(seed)
        g0 = jnp.asarray(images_gray[0])
        g1 = jnp.asarray(images_gray[1])
        f0 = sift.detect_and_compute(g0, cfg.frontend)
        f1 = sift.detect_and_compute(g1, cfg.frontend)
        key, kb = jax.random.split(key)
        tv = bootstrap(kb, f0, f1, K, cfg)
        m = map_store.init_map(K, cfg.map)
        m, cam0 = map_store.append_camera(m, tv.pose0)
        m, cam1 = map_store.append_camera(m, tv.pose1)
        zeros = jnp.zeros((tv.points.shape[0], 3))
        m, pids = map_store.append_points(m, tv.points, zeros, tv.valid)
        m = map_store.append_observations(m, cam0, pids, tv.uv0, tv.valid)
        m = map_store.append_observations(m, cam1, pids, tv.uv1, tv.valid)

        S = cfg.frontend.max_features
        # seed the track table from frame-1 features: matched ones carry ids
        positions = f1.xy
        tids = jnp.full((S,), -1, jnp.int32)
        slot = jnp.where(tv.valid, tv.idx1, S)
        tids = tids.at[slot].set(pids.astype(jnp.int32), mode="drop")
        state = KltState(
            map=m, prev_gray=g1, positions=positions, track_ids=tids,
            alive=f1.valid,
        )
        for i in range(2, len(images_gray)):
            g = jnp.asarray(images_gray[i])
            key, ki = jax.random.split(key)
            state, st = klt_step(ki, state, g, cfg)
            self.stats.append(
                {
                    "frame": i,
                    "tracked": int(st.num_tracked),
                    "pnp_inliers": int(st.num_pnp_inliers),
                    "new_points": int(st.num_new_points),
                    "reproj_error": float(st.reproj_error),
                }
            )
            if (i % self.redetect_every) == 0 and i + 1 < len(images_gray):
                f = sift.detect_and_compute(g, cfg.frontend)
                state = replenish(state, f, cfg)
        self.state = state
        return state.map
