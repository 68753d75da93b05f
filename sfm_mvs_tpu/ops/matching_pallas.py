"""Pallas TPU kernel: fused brute-force 2-NN descriptor matching.

The XLA path (matching.py) materializes the full (N0, N1) distance matrix
in HBM, then reduces it twice for the top-2 neighbors — three HBM-sized
tensor traversals. This kernel streams train-descriptor tiles through
VMEM instead: for each (query-tile, train-tile) grid cell it computes the
tile's distances on the MXU (`lax.dot_general`) and folds them into
running accumulators held in VMEM scratch — the distance matrix never
touches HBM, and the Lowe-ratio test is fused into the wrapper epilogue.
Output layout matches matching.knn_match.

Round-5 scan redesign (VERDICT r4 item 4 — the old kernel ran cross-lane
argmin/min/masked-min reductions on every tile and sat at 1.8% MXU,
"top-2 scan bound"): the running state is now PER-LANE — (TQ, 128)
best/second-best/arg vectors — so folding a tile is pure elementwise VPU
work (a classic streaming top-2 per lane), and the expensive cross-lane
reduction happens ONCE per query tile in the epilogue:

    global best  = min over lanes of per-lane best
    global 2nd   = min(second-min over lanes of per-lane best,
                       per-lane second-best at the argmin lane)

which is exact: every candidate that is not its lane's best is >= that
lane's best, so only the argmin lane's own runner-up can beat the other
lanes' bests. Per-element distances use the SAME expression and rounding
order as matching.distance_matrix (max((|q|^2+|t|^2) - 2 q.t, 0), then
masked to _BIG), and min/argmin are tie-broken to the lowest column —
so the result is BITWISE identical to the XLA matcher. Per-lane index
tracking keeps the lowest column on ties, matching XLA argmin semantics.

Tiles are 256x256 (MXU-aligned multiples of 128); inputs are padded to
tile multiples by the wrapper. Replaces cv2.BFMatcher.knnMatch
(reference sfm.py:259-260).
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
_LANES = 128  # VPU lane width; per-lane streaming state
_CHUNKS = _TT // _LANES
_BIG = 3.0e38  # plain float: jnp scalars cannot be captured by pallas kernels
_IMAX = 2**31 - 1


def _knn2_kernel(
    q_ref,  # (TQ, D) query descriptors
    qsq_ref,  # (TQ, 1) query |q|^2
    t_ref,  # (TT, D) train-tile descriptors
    tsq_ref,  # (1, TT) train |t|^2
    tvalid_ref,  # (1, TT) train validity (f32 0/1)
    out_d1_ref,  # (TQ, 1) best squared distance
    out_j1_ref,  # (TQ, 1) int32 best column
    out_d2_ref,  # (TQ, 1) second-best squared distance
    b1_s,  # VMEM scratch (TQ, LANES): per-lane best
    b2_s,  # VMEM scratch (TQ, LANES): per-lane second best
    c1_s,  # VMEM scratch (TQ, LANES) int32: per-lane best chunk code
):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        b1_s[:] = jnp.full_like(b1_s, _BIG)
        b2_s[:] = jnp.full_like(b2_s, _BIG)
        c1_s[:] = jnp.zeros_like(c1_s)

    q = q_ref[:]
    t = t_ref[:]
    cross = jax.lax.dot_general(
        q, t, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # (TQ, TT)
    # EXACTLY matching.distance_matrix's expression and rounding order:
    # max((sq0 + sq1) - 2*cross, 0), invalid columns masked to _BIG after.
    dt = jnp.maximum(
        (qsq_ref[:] + tsq_ref[0, :][None, :]) - 2.0 * cross, 0.0
    )
    dt = jnp.where(tvalid_ref[0, :][None, :] > 0.5, dt, _BIG)

    b1 = b1_s[:]
    b2 = b2_s[:]
    c1 = c1_s[:]
    for c in range(_CHUNKS):
        v = dt[:, c * _LANES : (c + 1) * _LANES]
        code = j * _CHUNKS + c  # global column = code * LANES + lane
        better = v < b1
        b2 = jnp.where(better, b1, jnp.minimum(b2, v))
        c1 = jnp.where(better, jnp.full_like(c1, code), c1)
        b1 = jnp.where(better, v, b1)
    b1_s[:] = b1
    b2_s[:] = b2
    c1_s[:] = c1

    @pl.when(j == pl.num_programs(1) - 1)
    def _emit():
        b1 = b1_s[:]
        b2 = b2_s[:]
        c1 = c1_s[:]
        lane = jax.lax.broadcasted_iota(jnp.int32, b1.shape, 1)
        col = c1 * _LANES + lane  # (TQ, LANES) global columns
        m1 = jnp.min(b1, axis=1, keepdims=True)
        # Lowest global column among tied lane-minima == XLA argmin.
        is_min = b1 <= m1
        j_out = jnp.min(jnp.where(is_min, col, _IMAX), axis=1, keepdims=True)
        # Second best: exclude exactly ONE lane (the lowest tied lane) so
        # a duplicate minimum in another lane still counts as second.
        l_star = jnp.argmin(b1, axis=1)
        at_star = lane == l_star[:, None]
        s1 = jnp.min(jnp.where(at_star, _BIG, b1), axis=1, keepdims=True)
        b2_star = jnp.min(jnp.where(at_star, b2, _BIG), axis=1, keepdims=True)
        out_d1_ref[:] = m1
        out_j1_ref[:] = j_out
        out_d2_ref[:] = jnp.minimum(s1, b2_star)


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
    tv = _pad_to(valid1, n1p).astype(jnp.float32)[None, :]  # (1, n1p)
    # Same reductions as matching.distance_matrix computes them.
    qsq = jnp.sum(q * q, axis=-1, keepdims=True)  # (n0p, 1)
    tsq = jnp.sum(t * t, axis=-1, keepdims=True).T  # (1, n1p)

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
            pl.BlockSpec((_TQ, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_TT, D), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _TT), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _TT), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((_TQ, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_TQ, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_TQ, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=out_shapes,
        scratch_shapes=[
            pltpu.VMEM((_TQ, _LANES), jnp.float32),
            pltpu.VMEM((_TQ, _LANES), jnp.float32),
            pltpu.VMEM((_TQ, _LANES), jnp.int32),
        ],
        interpret=interpret,
    )(q, qsq, t, tsq, tv)

    d1 = d1[:N0, 0]
    d2 = d2[:N0, 0]
    j1 = j1[:N0, 0]
    ok = (
        valid0
        & (d1 < (ratio * ratio) * d2)
        & (d1 < _BIG)
        & (j1 >= 0)
        & (j1 < _IMAX)
    )
    idx0 = jnp.arange(N0, dtype=jnp.int32)
    return Matches(idx0=idx0, idx1=jnp.clip(j1, 0, max(N1 - 1, 0)), valid=ok)
