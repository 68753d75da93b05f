"""Fixed-capacity masked-array utilities.

The reference compacts arrays with dynamic boolean indexing and numpy masked
arrays (sfm.py:229-237, 308-313) — shapes change every frame, which is
incompatible with XLA. Here every array keeps a static capacity; validity is
a boolean mask, and "compaction" is a stable permutation that moves valid
entries to the prefix (so uniform random ints in [0, count) index only valid
entries — the key enabler for vmapped RANSAC sampling).
"""

from __future__ import annotations

import jax.numpy as jnp


def compact_order(mask: jnp.ndarray) -> jnp.ndarray:
    """Stable permutation putting True entries of `mask` first. (N,) -> (N,)."""
    # argsort of (~mask) is stable in JAX, so relative order is preserved.
    return jnp.argsort(~mask, stable=True)


def compact(mask: jnp.ndarray, *arrays: jnp.ndarray):
    """Move valid rows to the prefix of each array.

    Returns (count, compacted_mask, *compacted_arrays). All shapes static.
    """
    order = compact_order(mask)
    count = jnp.sum(mask)
    out = tuple(a[order] for a in arrays)
    return (count, mask[order]) + out


def scatter_back(order_mask: jnp.ndarray, values: jnp.ndarray) -> jnp.ndarray:
    """Inverse of a compaction permutation (rarely needed; tracks use ids)."""
    inv = jnp.argsort(compact_order(order_mask), stable=True)
    return values[inv]


def masked_mean(x: jnp.ndarray, mask: jnp.ndarray, axis=None) -> jnp.ndarray:
    m = mask.astype(x.dtype)
    return jnp.sum(x * m, axis=axis) / jnp.maximum(jnp.sum(m, axis=axis), 1.0)


def pad_to(x: jnp.ndarray, capacity: int, fill=0):
    """Host-side helper: pad/truncate leading axis to `capacity`."""
    n = x.shape[0]
    if n >= capacity:
        return x[:capacity]
    pad_width = [(0, capacity - n)] + [(0, 0)] * (x.ndim - 1)
    return jnp.pad(x, pad_width, constant_values=fill)
