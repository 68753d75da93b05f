"""Data-parallel front end: batched feature detection + pair matching.

Frames are the embarrassingly parallel axis of SfM (SURVEY.md §2.3): a
batch of images shards across the mesh's 'data' axis, each device runs the
full SIFT stack + descriptor matching on its shard, and results come back
sharded the same way. This replaces the reference's strictly sequential
per-frame `find_features` calls (sfm.py:347) — and makes the isfm.py-style
exhaustive O(N^2) pair matching (isfm.py:68-87) practical, since pair
batches shard the same way.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from sfm_mvs_tpu.ops import matching, sift
from sfm_mvs_tpu.ops.sift import Features
from sfm_mvs_tpu.utils.config import FrontendConfig


@partial(jax.jit, static_argnames=("cfg",))
def detect_batch(images: jnp.ndarray, cfg: FrontendConfig) -> Features:
    """SIFT over a batch of images. images: (B, H, W) -> Features with
    leading batch dim. vmapped; shards over the batch via input sharding."""
    return jax.vmap(lambda im: sift.detect_and_compute(im, cfg))(images)


@partial(jax.jit, static_argnames=("ratio", "mutual"))
def match_batch(
    desc0: jnp.ndarray,
    desc1: jnp.ndarray,
    valid0: jnp.ndarray,
    valid1: jnp.ndarray,
    ratio: float = 0.70,
    mutual: bool = False,
) -> matching.Matches:
    """KNN-match a batch of descriptor pairs. desc*: (B, N, D)."""
    return jax.vmap(
        lambda d0, d1, v0, v1: matching.knn_match(d0, d1, v0, v1, ratio, mutual)
    )(desc0, desc1, valid0, valid1)


def detect_batch_sharded(images, cfg: FrontendConfig, mesh: Mesh, axis: str = "data"):
    """Device-put the image batch sharded over `axis` and detect.

    images: (B, H, W) with B divisible by the mesh axis size. XLA partitions
    the vmapped detector across devices; no collectives are needed (pure
    data parallelism).
    """
    sharding = NamedSharding(mesh, P(axis))
    images = jax.device_put(jnp.asarray(images), sharding)
    return detect_batch(images, cfg)


def match_pairs_sharded(
    feats: Features, pair_idx0, pair_idx1, mesh: Mesh, cfg: FrontendConfig,
    axis: str = "data",
):
    """Match a batch of (i, j) frame pairs, sharded over the pair axis.

    feats: batched Features (B frames, replicated); pair_idx0/1: (M,) frame
    indices per pair. Gathers each pair's descriptors then runs the sharded
    batched matcher — the data-parallel form of isfm.py's all-pairs loop.
    """
    sharding = NamedSharding(mesh, P(axis))
    d0 = jax.device_put(feats.desc[pair_idx0], sharding)
    d1 = jax.device_put(feats.desc[pair_idx1], sharding)
    v0 = jax.device_put(feats.valid[pair_idx0], sharding)
    v1 = jax.device_put(feats.valid[pair_idx1], sharding)
    return match_batch(d0, d1, v0, v1, ratio=cfg.lowe_ratio, mutual=cfg.mutual_check)
