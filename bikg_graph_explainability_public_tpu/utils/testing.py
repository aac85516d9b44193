"""Test-infrastructure helpers shared with ``tests/conftest.py``.

The test suite must decide *before importing jax for real work* whether to
pin the backend to the virtual 8-device CPU mesh (the default) or keep the
real TPU backend (``pytest -m tpu``).  The decision is made from the pytest
command line, so the parsing lives here where it can be unit-tested: a naive
substring match on ``"tpu"`` would treat ``pytest -m "not tpu"`` as a TPU
session and silently skip every CPU test (the round-3 footgun).
"""

from __future__ import annotations

from typing import Mapping, Optional, Sequence


def extract_marker_expression(argv: Sequence[str]) -> Optional[str]:
    """Return the ``-m`` marker expression from a pytest argv, if any.

    Handles both ``-m EXPR`` and the glued ``-mEXPR`` spelling.  The last
    occurrence wins, matching pytest's own option handling.
    """
    expr: Optional[str] = None
    argv = list(argv)
    for i, arg in enumerate(argv):
        if arg == "-m" and i + 1 < len(argv):
            expr = argv[i + 1]
        elif arg.startswith("-m") and len(arg) > 2 and not arg.startswith("--"):
            expr = arg[2:]
    return expr


class _MarkerNamespace(dict):
    """Name lookup for marker-expression evaluation with a default value."""

    def __init__(self, default: bool, **known: bool) -> None:
        super().__init__(**known)
        self._default = default

    def __missing__(self, key: str) -> bool:
        return self._default


def marker_expression_selects(expr: str, marker: str) -> bool:
    """True if the pytest ``-m`` expression *expr* can select a test
    carrying *marker*.

    Marker expressions use Python's ``and``/``or``/``not`` over marker
    names, so they evaluate directly with a namespace mapping names to
    booleans.  A test with *marker* may carry arbitrary other markers, so
    the expression is tried with every other name bound to both False and
    True; if either evaluation is truthy, some *marker*-carrying test could
    be selected.  Unparseable expressions fall back to a substring test
    (pytest itself will reject them anyway).
    """
    try:
        code = compile(expr, "<marker-expression>", "eval")
        for default in (False, True):
            ns = _MarkerNamespace(default, **{marker: True})
            if bool(eval(code, {"__builtins__": {}}, ns)):  # noqa: S307
                return True
        return False
    except Exception:
        return marker in expr


def want_tpu_backend(
    argv: Sequence[str], env: Mapping[str, str]
) -> bool:
    """Decide whether this pytest invocation should keep the TPU backend.

    True when ``BIKG_TEST_PLATFORM=tpu`` is set, or when the ``-m``
    expression mentions the ``tpu`` marker *and* can select a tpu-marked
    test (``-m tpu``, ``-m "tpu and slow"``).  ``-m "not tpu"`` correctly
    stays on the CPU mesh.
    """
    if env.get("BIKG_TEST_PLATFORM") == "tpu":
        return True
    expr = extract_marker_expression(argv)
    if expr is None or "tpu" not in expr:
        return False
    return marker_expression_selects(expr, "tpu")
