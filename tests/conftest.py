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


# ---- quick tier -----------------------------------------------------------
# The full suite is ~35 min on the CPU mesh; the wall-clock is dominated by
# a handful of heavy modules (cross-framework E2E goldens, 8-device mesh
# programs, SDXL-shaped toys). Those are auto-marked `slow` here so the
# inner loop can run `pytest -m "not slow"` (~minutes) and CI/judging runs
# the full suite. Individual tests can also opt in with @pytest.mark.slow.
SLOW_MODULES = {
    "test_e2e_golden",     # torch↔jax E2E goldens (HF CLIP + fp32 pipelines)
    "test_parallel",       # dp×tp mesh programs on the virtual 8-dev mesh
    "test_sdxl",           # SDXL-topology toys (dual tower, depth-10 middle)
    "test_checkpoint_e2e", # full-file safetensors round-trips
}

# ---- smoke tier (<5 min, VERDICT r4 #7) -----------------------------------
# `pytest -m smoke`: pure-math + parser/tokenizer + assets + one tiny
# pipeline e2e. The per-edit inner loop; `-m "not slow"` is the quick tier,
# the bare suite is the full tier.
SMOKE_MODULES = {
    "test_schedules",  # sigma schedules / AYS math
    "test_text",       # prompt grammar + BPE tokenizer
    "test_ssim",       # quality-gate metric properties
    "test_assets",     # asset resolution + self-containment
}
SMOKE_TESTS = {
    # (module, test) — one toy-scale pipeline e2e
    ("test_pipeline", "test_txt2img_end_to_end"),
}

import pytest  # noqa: E402


def pytest_collection_modifyitems(config, items):
    for item in items:
        # tests/ is a package, so __name__ is "tests.test_x" — match the tail
        mod = item.module.__name__.rsplit(".", 1)[-1]
        if mod in SLOW_MODULES:
            item.add_marker(pytest.mark.slow)
        if mod in SMOKE_MODULES or (mod, item.name) in SMOKE_TESTS:
            item.add_marker(pytest.mark.smoke)
