"""Distributed bundle adjustment: observation-sharded Schur reduction.

The map's observation table shards across the mesh (the 'sequence axis' of
this domain, SURVEY.md §5); camera and point state is replicated. Each
device computes its shard's residuals/Jacobians and PARTIAL segment-sums;
psum over the mesh axis yields the exact global Hessian blocks, Schur
products and CG inner products (ba.py threads the axis through every
reduction). The LM trajectory is therefore identical to the single-device
solve — verified in tests by bitwise-ish comparison — while the O(obs)
work (the dominant cost) scales with device count over ICI.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from sfm_mvs_tpu.models import ba
from sfm_mvs_tpu.models.ba import BAProblem, BAStats
from sfm_mvs_tpu.models.map_store import MapState


def _specs(mesh: Mesh, axis: str):
    """(in_spec tree for BAProblem): obs arrays sharded, the rest replicated."""
    rep = P()
    obs = P(axis)
    return BAProblem(
        cam_params=rep, points=rep, cam_valid=rep, point_valid=rep,
        obs_cam=obs, obs_point=obs, obs_uv=obs, obs_valid=obs,
        K=rep, frozen=rep,
    )


def run_ba_sharded(
    prob: BAProblem,
    mesh: Mesh,
    axis: str = "data",
    max_iterations: int = 20,
    cg_iters: int = 20,
    damping_init: float = 1e-3,
) -> tuple[BAProblem, BAStats]:
    """LM bundle adjustment with the observation table sharded over `axis`.

    Requires max_obs divisible by the axis size (capacities are powers of
    two, so any power-of-two mesh works).
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
