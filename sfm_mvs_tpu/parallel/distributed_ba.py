"""Distributed bundle adjustment: point-block-sharded Schur reduction.

The map's dense (P, C) observation grid and its point state shard by
POINT BLOCKS across the mesh (the 'sequence axis' of this domain,
SURVEY.md §5); camera state is replicated. Each device eliminates its own
point blocks entirely locally (V, V^-1, point back-substitution never
leave the device); only the small reduced camera system — (C,6,6) Hessian
blocks, (C,6) gradients and CG products — is psum-aggregated over ICI.
That is exactly the "per-device Schur elimination of local point blocks,
reduced camera blocks aggregated with collectives" design of SURVEY.md
§2.3. The LM trajectory is identical to the single-device solve —
verified in tests — while the O(P*C) work scales with device count.
"""

from __future__ import annotations

from functools import partial

import jax
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from sfm_mvs_tpu.models import ba
from sfm_mvs_tpu.models.ba import BAProblem, BAStats
from sfm_mvs_tpu.models.map_store import MapState


def _specs(mesh: Mesh, axis: str):
    """BAProblem spec tree: point axis sharded, camera state replicated."""
    rep = P()
    pt = P(axis)
    return BAProblem(
        cam_params=rep, points=pt, cam_valid=rep, point_valid=pt,
        obs_uv=pt, obs_mask=pt, K=rep, frozen=rep, intr=rep,
    )


def run_ba_sharded(
    prob: BAProblem,
    mesh: Mesh,
    axis: str = "data",
    max_iterations: int = 20,
    cg_iters: int = 20,
    damping_init: float = 1e-3,
) -> tuple[BAProblem, BAStats]:
    """LM bundle adjustment with point blocks sharded over `axis`.

    Requires max_points divisible by the axis size (capacities are powers
    of two, so any power-of-two mesh works).
    """
    in_specs = _specs(mesh, axis)
    out_specs = (in_specs, BAStats(P(), P(), P(), P()))

    @partial(
        shard_map, mesh=mesh, in_specs=(in_specs,), out_specs=out_specs,
        check_vma=False,
    )
    def _run(p: BAProblem):
        return ba.run_ba(
            p,
            max_iterations=max_iterations,
            cg_iters=cg_iters,
            damping_init=damping_init,
            axis_name=axis,
        )

    return jax.jit(_run)(prob)


def bundle_adjust_map_sharded(
    state: MapState,
    mesh: Mesh,
    axis: str = "data",
    max_iterations: int = 20,
    cg_iters: int = 20,
    frozen_first: int = 1,
) -> tuple[MapState, BAStats]:
    """map -> distributed BA -> map."""
    prob = ba.problem_from_map(state, frozen_first=frozen_first)
    prob, stats = run_ba_sharded(
        prob, mesh, axis=axis, max_iterations=max_iterations, cg_iters=cg_iters
    )
    return ba.write_back_to_map(state, prob), stats
