"""Runtime environment setup shared by the CLIs.

Some deployments import jax at interpreter startup (sitecustomize), which
makes the JAX_PLATFORMS env var ineffective by the time user code runs;
``setup_jax()`` re-applies it through jax.config (backends are created
lazily so this still works) and enables the persistent compilation cache.
"""
from __future__ import annotations

import hashlib
import os
import platform


def host_cache_dir(base="/tmp/jax_cache"):
    """Persistent-cache dir keyed by a host fingerprint.

    The cache may hold AOT executables compiled for a specific CPU
    feature set; reusing it across machines (shared /tmp images, copied
    containers) makes XLA's loader hit SIGILL on every entry. Keying the
    directory by (machine, cpu flags) keeps caches host-local.
    """
    bits = [platform.machine(), platform.system()]
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("flags", "Features")):
                    bits.append(line.strip())
                    break
    except OSError:
        pass
    fp = hashlib.sha1("|".join(bits).encode()).hexdigest()[:10]
    return f"{base}_{fp}"


def setup_jax(cache_dir=None):
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
    if cache_dir is None:
        cache_dir = host_cache_dir()
    if cache_dir:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        # keep XLA-internal AOT executables OUT of the persistent cache:
        # they embed compile-machine pseudo-features (+prefer-no-scatter)
        # that the loader flags as SIGILL risks on every load
        jax.config.update("jax_persistent_cache_enable_xla_caches", "none")
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          5.0)
    return jax
