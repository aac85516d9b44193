"""Test configuration: virtual 8-device CPU mesh by default, real TPU on
demand.

The default suite runs JAX on 8 virtual CPU devices so sharding correctness
is validated without multi-chip hardware (the compiled collectives are
identical under GSPMD).  Tests marked ``@pytest.mark.tpu`` exercise compiled
execution on the real chip; select them with ``pytest -m tpu`` — the CPU
force is then skipped so the session keeps the TPU backend.

The environment's sitecustomize imports jax before pytest starts, so the
platform must be forced via ``jax.config`` (env vars are already captured).
"""

import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# `pytest -m tpu` (or `-m "tpu and ..."`) keeps the real TPU backend; any
# other invocation pins the suite to the virtual CPU mesh.  Decided here
# (import time) because the backend must be chosen before any test touches
# jax.  BIKG_TEST_PLATFORM=tpu forces it regardless of markers.
def _want_tpu() -> bool:
    if os.environ.get("BIKG_TEST_PLATFORM") == "tpu":
        return True
    argv = sys.argv
    for i, a in enumerate(argv):
        if a == "-m" and i + 1 < len(argv) and "tpu" in argv[i + 1]:
            return True
        if a.startswith("-m") and "tpu" in a:
            return True
    return False


if not _want_tpu():
    jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "tpu: needs the real TPU backend (run with `pytest -m tpu`)"
    )


def pytest_collection_modifyitems(config, items):
    on_tpu = jax.default_backend() == "tpu"
    skip_tpu = pytest.mark.skip(reason="needs a real TPU backend")
    skip_cpu = pytest.mark.skip(
        reason="suite running on the TPU backend; CPU-mesh tests need "
        "8 virtual devices"
    )
    for item in items:
        if "tpu" in item.keywords and not on_tpu:
            item.add_marker(skip_tpu)
        elif "tpu" not in item.keywords and on_tpu:
            # non-tpu tests assume the CPU mesh; keep the TPU session lean
            item.add_marker(skip_cpu)


@pytest.fixture
def rng():
    return np.random.default_rng(0)
