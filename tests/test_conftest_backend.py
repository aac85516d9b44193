"""Regression tests for the test-backend decision logic.

Round 3's conftest substring-matched ``sys.argv`` for ``"tpu"``, so
``pytest -m "not tpu"`` — a completely natural invocation — kept the TPU
backend and silently skipped all CPU tests with exit 0.  The decision now
lives in :mod:`bikg_graph_explainability_public_tpu.utils.testing` and is
covered here for both invocations (plus the glued/env spellings).
"""

from bikg_graph_explainability_public_tpu.utils.testing import (
    extract_marker_expression,
    marker_expression_selects,
    want_tpu_backend,
)


def test_plain_invocation_is_cpu():
    assert not want_tpu_backend(["pytest", "tests", "-q"], {})


def test_m_tpu_selects_tpu():
    assert want_tpu_backend(["pytest", "-m", "tpu"], {})


def test_m_not_tpu_is_cpu():
    # The round-3 footgun: this must run the CPU suite, not skip it.
    assert not want_tpu_backend(["pytest", "-m", "not tpu"], {})


def test_glued_spelling():
    assert want_tpu_backend(["pytest", "-mtpu"], {})
    assert not want_tpu_backend(["pytest", "-mnot tpu"], {})


def test_compound_expressions():
    assert want_tpu_backend(["pytest", "-m", "tpu and slow"], {})
    assert want_tpu_backend(["pytest", "-m", "tpu or slow"], {})
    assert not want_tpu_backend(["pytest", "-m", "slow and not tpu"], {})


def test_env_override():
    assert want_tpu_backend(["pytest"], {"BIKG_TEST_PLATFORM": "tpu"})


def test_last_m_wins():
    argv = ["pytest", "-m", "tpu", "-m", "not tpu"]
    assert extract_marker_expression(argv) == "not tpu"
    assert not want_tpu_backend(argv, {})


def test_unrelated_marker_is_cpu():
    assert not want_tpu_backend(["pytest", "-m", "not slow"], {})


def test_unparseable_falls_back_to_substring():
    assert marker_expression_selects("tpu and and", "tpu")
    assert not marker_expression_selects("slow and and", "tpu")
