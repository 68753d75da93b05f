"""Coverage for profiling + multihost helper modules."""

import numpy as np

import jax
import jax.numpy as jnp

from sfm_mvs_tpu.parallel import multihost
from sfm_mvs_tpu.utils import profiling


def test_multihost_initialize_noop_single_host():
    assert multihost.initialize() is False  # no coordinator configured


def test_slice_mesh_single_process():
    mesh = multihost.slice_mesh()
    assert mesh.axis_names == ("dcn", "ici")
    assert mesh.devices.shape[0] == 1  # one process
    sh = multihost.ba_shardings(mesh)
    assert "points" in sh and "cameras" in sh


def test_roofline_record():
    r = profiling.Roofline("v5e")
    row = r.record("matmul", seconds=0.001, flops=1e9, bytes_=1e6)
    assert abs(row["achieved_tflops"] - 1.0) < 1e-9
    assert 0 < row["mxu_fraction"] < 1
    row2 = r.time_and_record(
        "add", lambda x: x + 1, jnp.ones(128), flops=128, iters=2
    )
    assert row2["ms"] > 0


def test_trace_annotation_contexts(tmp_path):
    with profiling.annotate("region"):
        jnp.sum(jnp.ones(8)).block_until_ready()
    # full trace capture (writes files)
    with profiling.trace(str(tmp_path / "tr")):
        jnp.sum(jnp.ones(8)).block_until_ready()
    assert (tmp_path / "tr").exists()
