"""Test configuration: run everything on a virtual 8-device CPU mesh.

Must set the XLA flags before jax is imported anywhere, so this lives at the
top of conftest. Benchmarks (`bench.py`) run on the real TPU chip instead.
"""

import os

# Force CPU: the environment pre-sets JAX_PLATFORMS=axon (the tunneled TPU
# chip); tests must run on the virtual 8-device CPU mesh.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
# Persistent compile cache makes repeated test runs much faster.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")

import jax

jax.config.update("jax_platforms", "cpu")
# The env vars alone don't enable the persistent cache on this backend;
# set the config knobs explicitly so repeated runs skip recompiles.
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import numpy as np
import pytest


def pytest_sessionstart(session):
    backend = jax.default_backend()
    assert backend == "cpu", f"tests must run on cpu, got {backend}"
    # Hard-fail (not skip) if the virtual mesh is missing: the multi-device
    # tests guard on 8 devices and would otherwise silently vanish from the
    # suite if the XLA_FLAGS injection above ever stopped applying.
    n = jax.device_count()
    assert n >= 8, (
        f"suite requires the virtual 8-device CPU mesh, got {n} — "
        "xla_force_host_platform_device_count not applied?"
    )


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)
