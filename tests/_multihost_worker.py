"""Worker process for the 2-process jax.distributed CPU simulation test.

Launched by tests/test_multihost.py as
`python tests/_multihost_worker.py <pid> <nprocs> <coordinator>`.
Each process contributes 4 virtual CPU devices -> an 8-device
(dcn=2, ici=4) slice mesh. Prints one JSON line the parent asserts on.
"""

import json
import sys
from functools import partial

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 4)


def main() -> int:
    pid, nprocs, addr = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]

    from sfm_mvs_tpu.parallel import multihost

    ok = multihost.initialize(addr, nprocs, pid)
    assert ok, "initialize() must report multi-process"
    assert jax.process_count() == nprocs
    assert jax.device_count() == 4 * nprocs
    assert jax.local_device_count() == 4

    import numpy as np
    import jax.numpy as jnp
    from jax import shard_map
    from jax.sharding import NamedSharding, PartitionSpec as P

    mesh = multihost.slice_mesh()
    assert mesh.devices.shape == (nprocs, 4)
    assert mesh.axis_names == ("dcn", "ici")

    # Global collective across BOTH axes: sum over a device-sharded iota.
    n = jax.device_count()
    sharding = NamedSharding(mesh, P(("dcn", "ici")))
    data = np.arange(n, dtype=np.float32)
    arr = jax.make_array_from_callback((n,), sharding, lambda idx: data[idx])

    @jax.jit
    @partial(shard_map, mesh=mesh, in_specs=P(("dcn", "ici")), out_specs=P())
    def total(x):
        return jax.lax.psum(jnp.sum(x), ("dcn", "ici"))

    s = float(total(arr))

    # The BA placement helper must build DCN-replicated / ICI-sharded
    # shardings on this mesh.
    sh = multihost.ba_shardings(mesh)
    assert sh["points"].spec == P("ici")
    assert sh["cameras"].spec == P()

    # Camera-block reduction pattern of distributed BA: point-sharded
    # partial sums psum'd over the ICI axis only, DCN replicated — the
    # layout that keeps collectives off DCN.
    Ppts, C = 32, 4
    blocks = np.arange(Ppts * C * 6 * 6, dtype=np.float32).reshape(
        Ppts, C, 6, 6
    )
    g = jax.make_array_from_callback(
        blocks.shape, NamedSharding(mesh, P("ici")), lambda idx: blocks[idx]
    )

    @jax.jit
    @partial(shard_map, mesh=mesh, in_specs=P("ici"), out_specs=P())
    def reduce_cams(w):
        return jax.lax.psum(jnp.sum(w, axis=0), "ici")

    U = np.asarray(reduce_cams(g))  # (C, 6, 6), fully replicated
    expect = blocks.sum(axis=0)
    cam_err = float(np.abs(U - expect).max())

    print(
        json.dumps(
            {
                "pid": pid,
                "process_count": jax.process_count(),
                "device_count": jax.device_count(),
                "psum_total": s,
                "cam_block_err": cam_err,
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
