"""Map-state checkpoint / resume.

The reference has no resume path — poses and cloud live in RAM and are
flushed once at the end (sfm.py:375,420-423; SURVEY.md §5). Here the full
pipeline state (map + sliding-window features + track ids) serializes to
a single .npz every K frames, and `load_pipeline` restores it so
registration continues from the last checkpointed frame.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np

import jax.numpy as jnp

from sfm_mvs_tpu.models.incremental import PipelineState
from sfm_mvs_tpu.models.map_store import MapState
from sfm_mvs_tpu.ops.sift import Features


def save_map(path: str, state: MapState) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    np.savez_compressed(
        path, **{f"map_{k}": np.asarray(v) for k, v in state._asdict().items()}
    )


def load_map(path: str) -> MapState:
    z = np.load(path)
    return MapState(**{k: jnp.asarray(z[f"map_{k}"]) for k in MapState._fields})


def save_pipeline(path: str, pstate: PipelineState, frame_index: int) -> None:
    """Checkpoint the full incremental state after `frame_index`."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    payload = {f"map_{k}": np.asarray(v) for k, v in pstate.map._asdict().items()}
    payload.update(
        {f"feat_{k}": np.asarray(v) for k, v in pstate.prev_feats._asdict().items()}
    )
    payload["prev_track"] = np.asarray(pstate.prev_track)
    payload["frame_index"] = np.asarray(frame_index)
    np.savez_compressed(path, **payload)


def load_pipeline(path: str) -> tuple[PipelineState, int]:
    z = np.load(path)
    state = MapState(**{k: jnp.asarray(z[f"map_{k}"]) for k in MapState._fields})
    feats = Features(**{k: jnp.asarray(z[f"feat_{k}"]) for k in Features._fields})
    return (
        PipelineState(
            map=state, prev_feats=feats, prev_track=jnp.asarray(z["prev_track"])
        ),
        int(z["frame_index"]),
    )


def latest_checkpoint(ckpt_dir: str) -> Optional[str]:
    if not os.path.isdir(ckpt_dir):
        return None
    cands = sorted(
        f for f in os.listdir(ckpt_dir) if f.startswith("frame_") and f.endswith(".npz")
    )
    return os.path.join(ckpt_dir, cands[-1]) if cands else None
