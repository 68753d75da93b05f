"""Fixed-capacity structure-of-arrays map: cameras, points, observations.

Replaces the reference's ad-hoc per-frame Python state (`Xtot`/`colorstot`
accumulated by np.vstack, sfm.py:284-285,387-395; the pts0/pts1/P1/P2
sliding window, sfm.py:399-409; and the exact-float-coordinate data
association of `common_points`, sfm.py:215-239) with the TPU idiom from
SURVEY.md §7: every table has a static capacity and a validity mask, so
the entire incremental pipeline is jit-able and shardable. Data
association is by integer *track id* threaded through matching — each
feature slot of the most recent frame remembers which 3D point it
observes (-1 if none), which is both O(N) and exact where the reference's
float-equality matching is O(N*M) and fragile.

Appending under jit: new rows are scattered at `count + prefix_sum(valid)`
positions — a fixed-shape scatter, no dynamic allocation.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from sfm_mvs_tpu.utils.config import MapConfig


class MapState(NamedTuple):
    """The reconstruction: sharded-friendly flat arrays + counters."""

    K: jnp.ndarray  # (3, 3) shared intrinsics
    poses: jnp.ndarray  # (max_cams, 3, 4) world->cam [R|t]
    cam_valid: jnp.ndarray  # (max_cams,) bool
    num_cams: jnp.ndarray  # () int32
    points: jnp.ndarray  # (max_pts, 3)
    colors: jnp.ndarray  # (max_pts, 3) BGR in [0, 255]
    point_valid: jnp.ndarray  # (max_pts,) bool
    num_points: jnp.ndarray  # () int32
    obs_cam: jnp.ndarray  # (max_obs,) int32 camera index
    obs_point: jnp.ndarray  # (max_obs,) int32 point index
    obs_uv: jnp.ndarray  # (max_obs, 2) pixel observation
    obs_valid: jnp.ndarray  # (max_obs,) bool
    num_obs: jnp.ndarray  # () int32


def init_map(K: jnp.ndarray, cfg: MapConfig) -> MapState:
    """Empty map with the configured capacities."""
    return MapState(
        K=jnp.asarray(K, jnp.float32),
        poses=jnp.zeros((cfg.max_cameras, 3, 4), jnp.float32),
        cam_valid=jnp.zeros((cfg.max_cameras,), bool),
        num_cams=jnp.zeros((), jnp.int32),
        points=jnp.zeros((cfg.max_points, 3), jnp.float32),
        colors=jnp.zeros((cfg.max_points, 3), jnp.float32),
        point_valid=jnp.zeros((cfg.max_points,), bool),
        num_points=jnp.zeros((), jnp.int32),
        obs_cam=jnp.full((cfg.max_obs,), -1, jnp.int32),
        obs_point=jnp.full((cfg.max_obs,), -1, jnp.int32),
        obs_uv=jnp.zeros((cfg.max_obs, 2), jnp.float32),
        obs_valid=jnp.zeros((cfg.max_obs,), bool),
        num_obs=jnp.zeros((), jnp.int32),
    )


def append_camera(state: MapState, pose: jnp.ndarray) -> tuple[MapState, jnp.ndarray]:
    """Add one camera; returns (state, cam_id)."""
    cam_id = state.num_cams
    return (
        state._replace(
            poses=state.poses.at[cam_id].set(pose),
            cam_valid=state.cam_valid.at[cam_id].set(True),
            num_cams=state.num_cams + 1,
        ),
        cam_id,
    )


def _append_indices(count: jnp.ndarray, valid: jnp.ndarray, capacity: int):
    """Scatter destinations for masked append: row i -> count + (#valid before i).

    Invalid rows are routed to `capacity` (dropped by XLA's out-of-bounds
    scatter semantics... clipped), so we instead route them to a dead slot:
    we clamp to capacity - 1 and rely on the validity write being False.
    Returns (dest (N,), new_count ()).
    """
    offs = jnp.cumsum(valid.astype(jnp.int32)) - 1
    dest = count + offs
    dest = jnp.where(valid, dest, capacity)  # OOB -> dropped by .at[] clip mode
    new_count = count + jnp.sum(valid.astype(jnp.int32))
    return dest, jnp.minimum(new_count, capacity)


def append_points(
    state: MapState,
    X: jnp.ndarray,
    colors: jnp.ndarray,
    valid: jnp.ndarray,
) -> tuple[MapState, jnp.ndarray]:
    """Masked-append new 3D points. Returns (state, point_ids (N,)).

    point_ids[i] is the map index for row i (undefined where ~valid; callers
    must carry `valid` alongside).
    """
    capacity = state.points.shape[0]
    dest, new_count = _append_indices(state.num_points, valid, capacity)
    return (
        state._replace(
            points=state.points.at[dest].set(X, mode="drop"),
            colors=state.colors.at[dest].set(colors, mode="drop"),
            point_valid=state.point_valid.at[dest].set(valid, mode="drop"),
            num_points=new_count,
        ),
        jnp.where(valid, dest, -1),
    )


def append_observations(
    state: MapState,
    cam_id: jnp.ndarray,
    point_ids: jnp.ndarray,
    uv: jnp.ndarray,
    valid: jnp.ndarray,
) -> MapState:
    """Masked-append observations (cam_id scalar or (N,), point_ids (N,))."""
    capacity = state.obs_cam.shape[0]
    dest, new_count = _append_indices(state.num_obs, valid, capacity)
    cam_ids = jnp.broadcast_to(jnp.asarray(cam_id, jnp.int32), point_ids.shape)
    return state._replace(
        obs_cam=state.obs_cam.at[dest].set(cam_ids, mode="drop"),
        obs_point=state.obs_point.at[dest].set(point_ids.astype(jnp.int32), mode="drop"),
        obs_uv=state.obs_uv.at[dest].set(uv, mode="drop"),
        obs_valid=state.obs_valid.at[dest].set(valid, mode="drop"),
        num_obs=new_count,
    )


def update_points(state: MapState, point_ids: jnp.ndarray, X: jnp.ndarray, valid: jnp.ndarray) -> MapState:
    """Overwrite existing points (BA write-back)."""
    capacity = state.points.shape[0]
    dest = jnp.where(valid & (point_ids >= 0), point_ids, capacity)
    return state._replace(points=state.points.at[dest].set(X, mode="drop"))


def update_poses(state: MapState, cam_ids: jnp.ndarray, poses: jnp.ndarray, valid: jnp.ndarray) -> MapState:
    """Overwrite existing camera poses (BA write-back)."""
    capacity = state.poses.shape[0]
    dest = jnp.where(valid & (cam_ids >= 0), cam_ids, capacity)
    return state._replace(poses=state.poses.at[dest].set(poses, mode="drop"))
