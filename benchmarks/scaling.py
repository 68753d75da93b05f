"""Multi-device scaling harness: front end + distributed BA.

Measures data-parallel front-end throughput and distributed-BA wall time
at 1, 2, 4, ... N devices on whatever platform is present, reporting
scaling efficiency (the BASELINE.md north-star asks for >=70% frames/s
efficiency at 2+ hosts). On this CI image only one TPU chip (or virtual
CPU devices) is available, so multi-device numbers here validate the
sharding machinery; run unchanged on a real slice for true efficiency.

    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python benchmarks/scaling.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import json
import sys
import time

import numpy as np


def main():
    import jax

    # sitecustomize imports jax pointed at the axon TPU tunnel before this
    # script runs; env vars alone are too late, but config updates before
    # first backend use still take effect (same pattern as tests/conftest).
    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
        if os.environ["JAX_PLATFORMS"] == "cpu":
            jax.config.update(
                "jax_num_cpu_devices",
                int(os.environ.get("SCALING_CPU_DEVICES", "8")),
            )
    import jax.numpy as jnp

    from sfm_mvs_tpu.models import map_store
    from sfm_mvs_tpu.parallel import distributed_ba, frontend, mesh as meshlib
    from sfm_mvs_tpu.utils.config import FrontendConfig, MapConfig
    from sfm_mvs_tpu.utils.synthetic import make_scene, render_staircase_sequence

    devices = jax.devices()
    n_dev = len(devices)
    sizes = [s for s in [1, 2, 4, 8, 16, 32] if s <= n_dev]
    print(f"platform={devices[0].platform} devices={n_dev}", file=sys.stderr)

    results = {"platform": devices[0].platform, "num_devices": n_dev}
    if devices[0].platform == "cpu":
        # Virtual CPU devices share the host's physical cores (they exist
        # to validate sharding semantics, not to add compute), so measured
        # "efficiency" here is a lower bound that mostly reflects XLA-CPU
        # thread-pool contention — NOT hardware scaling. On a real slice
        # each mesh step adds actual chips.
        results["note"] = (
            "virtual CPU mesh: devices share physical cores; efficiency "
            "validates machinery, not hardware scaling"
        )

    # --- Data-parallel front end: fixed per-device batch (weak scaling). ---
    cfg = FrontendConfig(
        max_features=1024, num_octaves=3, upsample_input=False,
        contrast_threshold=0.015,
    )
    imgs, _, _ = render_staircase_sequence(num_cameras=8, image_size=(320, 240))
    fe = []
    for s in sizes:
        mesh = meshlib.make_mesh((s,), ("data",), devices=devices[:s])
        batch = jnp.asarray(np.stack([imgs[i % 8] for i in range(s)]))
        f = frontend.detect_batch_sharded(batch, cfg, mesh)  # compile
        jax.block_until_ready(f.desc)
        t0 = time.time()
        for _ in range(5):
            f = frontend.detect_batch_sharded(batch, cfg, mesh)
        jax.block_until_ready(f.desc)
        dt = (time.time() - t0) / 5
        fe.append({"devices": s, "images_per_s": round(s / dt, 2)})
        print(f"frontend x{s}: {s/dt:.2f} img/s", file=sys.stderr)
    if len(fe) > 1:
        eff = fe[-1]["images_per_s"] / (fe[0]["images_per_s"] * fe[-1]["devices"])
        results["frontend_weak_scaling_efficiency"] = round(eff, 3)
    results["frontend"] = fe

    # --- Distributed BA: fixed problem (strong scaling). ---
    rng = np.random.default_rng(0)
    scene = make_scene(num_points=16000, num_cameras=32, arc_degrees=50)
    mc = MapConfig(max_cameras=32, max_points=32768)
    state = map_store.init_map(jnp.asarray(scene.K), mc)
    for c in range(32):
        state, _ = map_store.append_camera(state, jnp.asarray(scene.Rt[c]))
    Xn = scene.points + rng.normal(scale=0.03, size=scene.points.shape).astype(
        np.float32
    )
    state, pids = map_store.append_points(
        state, jnp.asarray(Xn), jnp.zeros((16000, 3)), jnp.ones(16000, dtype=bool)
    )
    for c in range(0, 32, 4):
        uv, _ = scene.project(c)
        state = map_store.append_observations(
            state, c, pids, jnp.asarray(uv.astype(np.float32)),
            jnp.ones(16000, dtype=bool),
        )
    bas = []
    for s in sizes:
        mesh = meshlib.make_mesh((s,), ("data",), devices=devices[:s])
        _, st = distributed_ba.bundle_adjust_map_sharded(
            state, mesh, max_iterations=6, cg_iters=12
        )
        jax.block_until_ready(st.final_cost)
        t0 = time.time()
        for _ in range(3):
            _, st = distributed_ba.bundle_adjust_map_sharded(
                state, mesh, max_iterations=6, cg_iters=12
            )
        jax.block_until_ready(st.final_cost)
        dt = (time.time() - t0) / 3
        bas.append({"devices": s, "ba_wall_s": round(dt, 4)})
        print(f"dist-BA x{s}: {dt*1e3:.1f} ms", file=sys.stderr)
    if len(bas) > 1:
        speedup = bas[0]["ba_wall_s"] / bas[-1]["ba_wall_s"]
        results["ba_strong_scaling_speedup"] = round(speedup, 2)
        results["ba_strong_scaling_efficiency"] = round(
            speedup / bas[-1]["devices"], 3
        )
    results["distributed_ba"] = bas

    print(json.dumps(results))


if __name__ == "__main__":
    main()
