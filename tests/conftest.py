"""Test configuration: run all tests on a virtual 8-device CPU mesh.

Multi-chip sharding is validated on virtual CPU devices
(``xla_force_host_platform_device_count``); real-TPU benchmarks run
separately via bench.py.

Note: the environment's sitecustomize imports jax at interpreter startup,
so JAX_PLATFORMS set here would be too late — but backend clients are
created lazily, so ``jax.config.update`` + XLA_FLAGS still take effect.
"""
import os
import sys

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# persistent compilation cache: repeat test runs skip the (minutes-long)
# XLA compiles of the full models. Keyed by host fingerprint so stale
# AOT entries from another machine's CPU don't SIGILL on load.
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from detmatch_tpu.utils.env import host_cache_dir  # noqa: E402

_cache = host_cache_dir()
os.makedirs(_cache, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _cache)
jax.config.update("jax_persistent_cache_enable_xla_caches",
                  "none")  # AOT entries embed compile-machine pseudo-features
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)



def pytest_configure(config):
    assert jax.devices()[0].platform == "cpu", jax.devices()
    assert len(jax.devices()) == 8
