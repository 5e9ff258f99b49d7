"""Test configuration: force a virtual 8-device CPU mesh.

The reference framework has no tests at all (SURVEY.md §4). We follow the
rebuild test strategy instead: run everything on a CPU backend with 8 virtual
devices so mesh/sharding code paths are exercised without TPU hardware
(`XLA_FLAGS=--xla_force_host_platform_device_count=8`).

This module must set the env vars BEFORE jax is imported anywhere.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The environment's sitecustomize force-registers the TPU backend and sets
# jax_platforms="axon,cpu", overriding the env var — undo that here, before
# any backend is initialized, so tests really run on the virtual CPU mesh.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)


def pytest_sessionstart(session):
    assert jax.default_backend() == "cpu", jax.default_backend()
    assert jax.device_count() == 8, jax.devices()
