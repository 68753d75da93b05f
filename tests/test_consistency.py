"""Replication-consistency checks across the virtual device mesh."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from sfm_mvs_tpu.parallel import consistency, mesh as meshlib


@pytest.fixture(scope="module")
def mesh8():
    return meshlib.make_mesh((8,), ("data",))


def test_replicated_array_passes(mesh8):
    x = jax.device_put(jnp.arange(64.0), NamedSharding(mesh8, P()))
    consistency.assert_replicated(x, "x")
    assert len(consistency.device_checksums(x)) == 8


def test_divergent_replicas_detected(mesh8):
    # Build a *sharded* array and lie that it is replicated: shards differ.
    x = jax.device_put(jnp.arange(64.0), NamedSharding(mesh8, P("data")))
    with pytest.raises(AssertionError, match="replication divergence"):
        consistency.assert_replicated(x, "x")


def test_fingerprint_deterministic():
    tree = {"a": jnp.arange(5.0), "b": jnp.ones((3, 3))}
    f1 = consistency.state_fingerprint(tree)
    f2 = consistency.state_fingerprint(
        {"a": jnp.arange(5.0), "b": jnp.ones((3, 3))}
    )
    assert f1 == f2
    f3 = consistency.state_fingerprint({"a": jnp.arange(5.0) + 1e-6, "b": jnp.ones((3, 3))})
    assert f1 != f3


def test_distributed_ba_output_replicated(rng, mesh8):
    from tests.test_parallel import _ba_state
    from sfm_mvs_tpu.models import ba as ba_mod
    from sfm_mvs_tpu.parallel import distributed_ba

    state, scene = _ba_state(rng)
    prob = ba_mod.problem_from_map(state)
    new_prob, _ = distributed_ba.run_ba_sharded(
        prob, mesh8, max_iterations=4, cg_iters=10
    )
    consistency.check_ba_replication(new_prob.cam_params, new_prob.points)
