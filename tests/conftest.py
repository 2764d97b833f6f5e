"""Test configuration: run on CPU (native f64, fast jit) with a virtual
8-device platform so sharding tests exercise a real mesh without TPU hardware.
Must run before the first jax import anywhere in the test process."""

import os

# This environment pre-registers the tunneled TPU backend from sitecustomize
# and pins JAX_PLATFORMS=axon — a plain env override is ignored.  Force the
# platform through the config API instead (must happen before any backend
# initialization).
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: the suite is compile-dominated (single CPU
# core, dozens of jitted engines); repeat runs load the compiled programs
# from disk instead of recompiling.
_cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REFERENCE_CIRCUITS = "/root/reference/circuits"

import pytest  # noqa: E402


@pytest.fixture
def circuits_dir():
    return REFERENCE_CIRCUITS


def read_fixture(name: str) -> str:
    with open(os.path.join(REFERENCE_CIRCUITS, name)) as f:
        return f.read()
