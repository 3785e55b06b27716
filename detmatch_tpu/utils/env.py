"""Runtime environment setup shared by the CLIs.

Some deployments import jax at interpreter startup (sitecustomize), which
makes the JAX_PLATFORMS env var ineffective by the time user code runs;
``setup_jax()`` re-applies it through jax.config (backends are created
lazily so this still works) and enables the persistent compilation cache.
"""
from __future__ import annotations

import os


def setup_jax(cache_dir="/tmp/jax_cache"):
    ndev = os.environ.get("DETMATCH_HOST_DEVICES")
    if ndev:
        flags = os.environ.get("XLA_FLAGS", "")
        if "host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags + f" --xla_force_host_platform_device_count={ndev}"
            ).strip()
    import jax
    platforms = os.environ.get("JAX_PLATFORMS_OVERRIDE") or \
        os.environ.get("DETMATCH_PLATFORM")
    if platforms:
        jax.config.update("jax_platforms", platforms)
    if cache_dir:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          5.0)
    return jax
