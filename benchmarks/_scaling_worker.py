"""Worker for the contention-free multi-process scaling benchmark.

Launched by benchmarks/scaling_multiproc.py as
    taskset -c <core> python benchmarks/_scaling_worker.py \
        <pid> <nprocs> <coordinator> <P> <C> <lm_iters> <cg_iters>

One CPU device per process, each process pinned to a DISJOINT physical
core by the parent — so adding a process adds real compute, unlike the
virtual 8-device single-host mesh (whose "devices" share cores and whose
strong-scaling numbers are contention artifacts, SCALING.json r3 note).

Measures, on the point-block-sharded distributed BA:
  - per-LM-iteration wall time (strong scaling: fixed global problem),
  - a psum microbench of the exact reduced-camera payload, term by term,
  - the final cost (parent asserts parity across process counts).
Process 0 prints one JSON line.
"""

import json
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 1)


def main() -> int:
    pid, nprocs, addr = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
    P_CAP, C_CAP = int(sys.argv[4]), int(sys.argv[5])
    LM_IT, CGI = int(sys.argv[6]), int(sys.argv[7])

    import numpy as np

    from sfm_mvs_tpu.parallel import multihost

    if nprocs > 1:
        ok = multihost.initialize(addr, nprocs, pid)
        assert ok and jax.process_count() == nprocs

    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as Pp
    from jax import shard_map

    from sfm_mvs_tpu.models import ba as ba_mod
    from sfm_mvs_tpu.models import map_store
    from sfm_mvs_tpu.parallel import distributed_ba
    from sfm_mvs_tpu.utils.config import MapConfig
    from sfm_mvs_tpu.utils.synthetic import make_scene

    devices = jax.devices()
    assert len(devices) == nprocs
    mesh = Mesh(np.asarray(devices).reshape(nprocs), ("data",))

    # Deterministic problem, identical in every process (capacity-sized
    # dense grid; BA cost depends on capacity, not content).
    rng = np.random.default_rng(1)
    scene = make_scene(num_points=4096, num_cameras=C_CAP, arc_degrees=70)
    mc = MapConfig(max_cameras=C_CAP, max_points=P_CAP)
    st = map_store.init_map(jnp.asarray(scene.K), mc)
    for c in range(C_CAP):
        st, _ = map_store.append_camera(st, jnp.asarray(scene.Rt[c]))
    reps = P_CAP // 4096
    Xb = np.tile(scene.points, (reps, 1)) + rng.normal(
        scale=0.03, size=(P_CAP, 3)
    ).astype(np.float32)
    st, pb = map_store.append_points(
        st, jnp.asarray(Xb), jnp.zeros((P_CAP, 3)), jnp.ones(P_CAP, bool)
    )
    for c in range(0, C_CAP, 8):
        uv, _ = scene.project(c)
        st = map_store.append_observations(
            st, c, pb, jnp.asarray(np.tile(uv, (reps, 1)).astype(np.float32)),
            jnp.ones(P_CAP, bool),
        )
    prob_host = ba_mod.problem_from_map(st)

    # Distribute: point-axis arrays sharded over processes, camera state
    # replicated. Each process materializes only its own block.
    def dist(x, spec):
        sh = NamedSharding(mesh, spec)
        xn = np.asarray(x)
        return jax.make_array_from_callback(xn.shape, sh, lambda i: xn[i])

    specs = ba_mod.BAProblem(
        cam_params=Pp(), points=Pp("data"), cam_valid=Pp(),
        point_valid=Pp("data"), obs_uv=Pp("data"), obs_mask=Pp("data"),
        K=Pp(), frozen=Pp(), intr=Pp(),
    )
    prob = jax.tree_util.tree_map(dist, prob_host, specs)

    # --- Strong scaling: per-LM-iteration wall on the fixed problem. ---
    out, stats = distributed_ba.run_ba_sharded(
        prob, mesh, max_iterations=LM_IT, cg_iters=CGI
    )  # compile
    jax.block_until_ready(stats.final_cost)
    t0 = time.time()
    REPS = 3
    for _ in range(REPS):
        out, stats = distributed_ba.run_ba_sharded(
            prob, mesh, max_iterations=LM_IT, cg_iters=CGI
        )
        jax.block_until_ready(stats.final_cost)
    lm_iter_s = (time.time() - t0) / (REPS * LM_IT)
    final_cost = float(stats.final_cost)

    # --- psum microbench: the exact reduced-camera payload, per term. ---
    def time_psum(shape, n_inner=50):
        x = dist(np.ones((nprocs,) + shape, np.float32), Pp("data"))

        @jax.jit
        @partial(shard_map, mesh=mesh, in_specs=Pp("data"), out_specs=Pp("data"),
                 check_vma=False)
        def many(v):
            def body(i, acc):
                return acc + jax.lax.psum(acc, "data") * 1e-9
            return jax.lax.fori_loop(0, n_inner, body, v)

        many(x)  # compile
        jax.block_until_ready(many(x))
        t0 = time.time()
        r = many(x)
        jax.block_until_ready(r)
        return (time.time() - t0) / n_inner

    terms = {
        "U_c66": (C_CAP, 6, 6),
        "g_c6": (C_CAP, 6),
        "cam_active_c": (C_CAP,),
        "cg_step_c6": (C_CAP, 6),
        "cost_scalars": (4,),
    }
    psum_us = {}
    if nprocs > 1:
        for name, shape in terms.items():
            psum_us[name] = round(time_psum(shape) * 1e6, 1)
        # Per LM iteration: U + g + active + rhs(c6) + cost scalars once,
        # plus one (C,6) reduction per CG step.
        per_lm_us = (
            psum_us["U_c66"] + 2 * psum_us["g_c6"]
            + psum_us["cam_active_c"] + psum_us["cost_scalars"]
            + CGI * psum_us["cg_step_c6"]
        )
    else:
        per_lm_us = 0.0

    if pid == 0:
        print(json.dumps({
            "nprocs": nprocs,
            "lm_iter_s": round(lm_iter_s, 5),
            "final_cost": final_cost,
            "psum_term_us": psum_us,
            "measured_comm_us_per_lm_iter": round(per_lm_us, 1),
        }), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
