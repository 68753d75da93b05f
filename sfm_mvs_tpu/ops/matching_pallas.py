"""Pallas TPU kernel: fused brute-force 2-NN descriptor matching.

The XLA path (matching.py) materializes the full (N0, N1) distance matrix
in HBM, then reduces it twice for the top-2 neighbors — three HBM-sized
tensor traversals. This kernel streams train-descriptor tiles through
VMEM instead: for each (query-tile, train-tile) grid cell it computes the
tile's distances on the MXU (`pl.dot`) and folds them into running
(best, second-best, argmin) accumulators held in VMEM scratch — the
distance matrix never touches HBM, and the Lowe-ratio test is fused into
the epilogue of the last tile. Output layout matches matching.knn_match.

Tiles are 256x256 (MXU-aligned multiples of 128); inputs are padded to
tile multiples by the wrapper.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sfm_mvs_tpu.ops.matching import Matches

_TQ = 256  # query tile rows
_TT = 256  # train tile cols
_BIG = 3.0e38  # plain float: jnp scalars cannot be captured by pallas kernels


def _knn2_kernel(
    q_ref,  # (TQ, D) query descriptors
    t_ref,  # (TT, D) train-tile descriptors
    tvalid_ref,  # (1, TT) train validity (f32 0/1)
    out_d1_ref,  # (TQ, 1)
    out_j1_ref,  # (TQ, 1) int32
    out_d2_ref,  # (TQ, 1)
    d1_s,  # VMEM scratch (TQ, 1)
    j1_s,  # VMEM scratch (TQ, 1) int32
    d2_s,  # VMEM scratch (TQ, 1)
):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        d1_s[:] = jnp.full_like(d1_s, _BIG)
        j1_s[:] = jnp.full_like(j1_s, -1)
        d2_s[:] = jnp.full_like(d2_s, _BIG)

    q = q_ref[:]
    t = t_ref[:]
    # Squared L2 distances for this tile on the MXU.
    cross = jax.lax.dot_general(
        q, t, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    qsq = jnp.sum(q * q, axis=1, keepdims=True)
    tsq = jnp.sum(t * t, axis=1, keepdims=True).T
    d2 = jnp.maximum(qsq + tsq - 2.0 * cross, 0.0)
    d2 = jnp.where(tvalid_ref[0, :][None, :] > 0.5, d2, _BIG)

    # Tile-local best/second-best.
    loc_j = jnp.argmin(d2, axis=1)
    loc_d1 = jnp.min(d2, axis=1)
    cols = jax.lax.broadcasted_iota(jnp.int32, d2.shape, 1)
    masked = jnp.where(cols == loc_j[:, None], _BIG, d2)
    loc_d2 = jnp.min(masked, axis=1)
    loc_j_global = (loc_j + j * _TT).astype(jnp.int32)

    # Merge the tile's (d1, d2) pair into the running accumulators.
    r1 = d1_s[:, 0]
    rj = j1_s[:, 0]
    r2 = d2_s[:, 0]
    new_d1 = jnp.minimum(r1, loc_d1)
    new_j = jnp.where(loc_d1 < r1, loc_j_global, rj)
    # second best = min of the losers and both second-bests
    new_d2 = jnp.minimum(jnp.maximum(r1, loc_d1), jnp.minimum(r2, loc_d2))
    d1_s[:, 0] = new_d1
    j1_s[:, 0] = new_j
    d2_s[:, 0] = new_d2

    @pl.when(j == pl.num_programs(1) - 1)
    def _emit():
        out_d1_ref[:] = d1_s[:]
        out_j1_ref[:] = j1_s[:]
        out_d2_ref[:] = d2_s[:]


def _pad_to(x, n, fill=0):
    pad = n - x.shape[0]
    if pad <= 0:
        return x
    cfg = [(0, pad)] + [(0, 0)] * (x.ndim - 1)
    return jnp.pad(x, cfg, constant_values=fill)


@partial(jax.jit, static_argnames=("ratio", "interpret"))
def knn_match_pallas(
    desc0: jnp.ndarray,
    desc1: jnp.ndarray,
    valid0: jnp.ndarray,
    valid1: jnp.ndarray,
    ratio: float = 0.70,
    interpret: bool = False,
) -> Matches:
    """Drop-in Pallas replacement for matching.knn_match (mutual=False).

    desc0: (N0, D); desc1: (N1, D). Returns Matches of length N0.
    `interpret=True` runs the kernel in interpreter mode (CPU tests).
    """
    N0, D = desc0.shape
    N1 = desc1.shape[0]
    n0p = ((N0 + _TQ - 1) // _TQ) * _TQ
    n1p = ((N1 + _TT - 1) // _TT) * _TT
    q = _pad_to(desc0, n0p)
    t = _pad_to(desc1, n1p)
    tv = _pad_to(valid1.astype(jnp.float32), n1p)[None, :]  # (1, n1p)

    grid = (n0p // _TQ, n1p // _TT)
    out_shapes = (
        jax.ShapeDtypeStruct((n0p, 1), jnp.float32),
        jax.ShapeDtypeStruct((n0p, 1), jnp.int32),
        jax.ShapeDtypeStruct((n0p, 1), jnp.float32),
    )
    d1, j1, d2 = pl.pallas_call(
        _knn2_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((_TQ, D), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_TT, D), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _TT), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((_TQ, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_TQ, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_TQ, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=out_shapes,
        scratch_shapes=[
            pltpu.VMEM((_TQ, 1), jnp.float32),
            pltpu.VMEM((_TQ, 1), jnp.int32),
            pltpu.VMEM((_TQ, 1), jnp.float32),
        ],
        interpret=interpret,
    )(q, t, tv)

    d1 = d1[:N0, 0]
    j1 = j1[:N0, 0]
    d2 = d2[:N0, 0]
    ok = valid0 & (d1 < (ratio * ratio) * d2) & (d1 < _BIG) & (j1 >= 0)
    idx0 = jnp.arange(N0, dtype=jnp.int32)
    return Matches(idx0=idx0, idx1=jnp.maximum(j1, 0), valid=ok)
