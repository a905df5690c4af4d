"""Test configuration: force a deterministic 8-virtual-device CPU mesh.

Multi-chip sharding logic is unit-tested on one host via XLA's host-platform
device-count override (no pod required); real-TPU tests are opt-in via the
``tpu`` marker and RUN_TPU_TESTS=1.

Note: this environment's sitecustomize pre-imports jax and forces
``jax_platforms="axon,cpu"`` (TPU tunnel). Env vars are therefore too late —
we must switch the platform via ``jax.config.update`` after import, before any
backend is initialized. XLA_FLAGS is still read lazily at CPU-client creation,
so setting it here works.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

if os.environ.get("RUN_TPU_TESTS", "0") != "1":
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import pytest  # noqa: E402


def pytest_collection_modifyitems(config, items):
    run_tpu = os.environ.get("RUN_TPU_TESTS", "0") == "1"
    skip_tpu = pytest.mark.skip(reason="requires real TPU (set RUN_TPU_TESTS=1)")
    for item in items:
        if "tpu" in item.keywords and not run_tpu:
            item.add_marker(skip_tpu)
