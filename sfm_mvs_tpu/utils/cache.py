"""Persistent XLA compilation cache helper.

SfM programs here compile in minutes (SIFT's unrolled octaves + RANSAC +
the BA while_loop); enabling JAX's persistent cache makes every rerun of
the same shapes start in seconds. Call once before the first jit use.

WARNING: do NOT enable by default in this repo's CI environment — the
persistent cache deadlocks against the axon remote-compile tunnel
(compiles that take ~100s without it never complete with it). Opt in only
on directly-attached hardware.
"""

from __future__ import annotations

import os


def enable(cache_dir: str = "/tmp/sfm_jax_cache", min_compile_secs: float = 1.0):
    import jax

    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", min_compile_secs)
