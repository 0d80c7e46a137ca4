"""Test harness: run everything on a virtual 8-device CPU mesh.

TPU hardware in CI is a single chip reached through a slow tunnel; unit and
sharding tests instead run on host-platform virtual devices (exactly how the
driver validates the multi-chip path). The environment preloads jax and sets
JAX_PLATFORMS=axon via sitecustomize, so we must override the config directly,
not via setdefault.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# jax may already be imported (sitecustomize); force the platform while the
# backend is still uninitialized.
jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture(scope="session", autouse=True)
def _assert_cpu_devices():
    devices = jax.devices()
    assert devices[0].platform == "cpu", devices
    yield


@pytest.fixture(scope="module", autouse=True)
def _clear_jax_caches_between_modules():
    """Full-suite runs SEGFAULT (rc=139) in XLA-CPU once hundreds of
    executables have accumulated — reproduced 6x, always at whichever
    big-compile test lands ~#230 in collection order (moved when tests
    moved), never in isolation. Dropping the executable caches between
    modules keeps the per-process count bounded; cross-module compile
    sharing is minor (modules exercise different programs)."""
    yield
    jax.clear_caches()


@pytest.fixture
def rng():
    return np.random.default_rng(0)
