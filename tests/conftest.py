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


_SESSION_T0 = None
CORE_TIER_BUDGET_S = 600  # pytest.ini's promise: core tier < 10 min


def pytest_sessionstart(session):
    global _SESSION_T0
    import time
    _SESSION_T0 = time.time()


def pytest_sessionfinish(session, exitstatus):
    """Keep the core tier honest: if `-m "not slow"` (the advertised
    core tier) overruns its 10-minute budget on this host, fail the
    session — a tier developers stop running is a tier that stops
    catching anything. Opt out for debugging with
    DETMATCH_NO_TIER_BUDGET=1."""
    import time
    if os.environ.get("DETMATCH_NO_TIER_BUDGET") == "1":
        return
    markexpr = getattr(session.config.option, "markexpr", "") or ""
    if "not slow" not in markexpr.replace("'", "").replace('"', ""):
        return
    elapsed = time.time() - _SESSION_T0
    if elapsed > CORE_TIER_BUDGET_S and exitstatus == 0:
        print(f"\nCORE TIER OVER BUDGET: {elapsed:.0f}s > "
              f"{CORE_TIER_BUDGET_S}s — demote something to the slow "
              f"tier (pytest.ini promise).")
        session.exitstatus = 1
