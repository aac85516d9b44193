"""Test configuration: virtual 8-device CPU mesh by default, real TPU on
demand.

The default suite runs JAX on 8 virtual CPU devices so sharding correctness
is validated without multi-chip hardware (the compiled collectives are
identical under GSPMD).  Tests marked ``@pytest.mark.tpu`` exercise compiled
execution on the real chip; select them with ``pytest -m tpu`` — the CPU
force is then skipped so the session keeps the TPU backend.  ``pytest -m
"not tpu"`` stays on the CPU mesh and runs the full CPU suite (the marker
expression is parsed properly, not substring-matched — see
``utils/testing.py`` and ``tests/test_conftest_backend.py``).

The environment's sitecustomize imports jax before pytest starts, so the
platform must be forced via ``jax.config`` (env vars are already captured).
"""

import importlib.util
import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# Load the backend-decision helper by path so the package __init__ (and its
# jax-touching imports) does not run before the platform is pinned.
_testing_path = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "bikg_graph_explainability_public_tpu",
    "utils",
    "testing.py",
)
_spec = importlib.util.spec_from_file_location("_bikg_testing", _testing_path)
_bikg_testing = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(_bikg_testing)

_WANT_TPU = _bikg_testing.want_tpu_backend(sys.argv, os.environ)
if not _WANT_TPU:
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
    n_backend_skipped = 0
    for item in items:
        if "tpu" in item.keywords and not on_tpu:
            item.add_marker(skip_tpu)
            n_backend_skipped += 1
        elif "tpu" not in item.keywords and on_tpu:
            # non-tpu tests assume the CPU mesh; keep the TPU session lean
            item.add_marker(skip_cpu)
            n_backend_skipped += 1
    # Guard against the silent-green footgun: if backend selection skipped
    # EVERY collected test, the invocation almost certainly did not mean
    # what it said (e.g. a TPU session collecting only CPU tests).  Fail
    # loudly instead of exiting 0 having tested nothing.
    if items and n_backend_skipped == len(items):
        backend = "tpu" if on_tpu else jax.default_backend()
        raise pytest.UsageError(
            f"backend selection ({backend!r}) skipped all "
            f"{len(items)} collected tests — nothing would run. "
            "Use `pytest -m tpu` for the TPU tests or drop the marker "
            "filter for the CPU suite."
        )


@pytest.fixture
def rng():
    return np.random.default_rng(0)
