"""CI marker for the documented deployment gates (DEPLOYMENT.md).

The delta-spark dependency gates exactly ONE suite
(tests/test_state_delta.py). This test keeps that inventory honest in
both directions: if delta-spark becomes importable here, the gate note
is stale (the suite should be running and DEPLOYMENT.md updated); if
more modules start import-skipping on delta, they must be added to the
documented list.
"""

import pathlib
import re

REPO = pathlib.Path(__file__).resolve().parent.parent
DOCUMENTED_DELTA_GATED = {"tests/test_state_delta.py"}


def _delta_available() -> bool:
    try:
        import delta  # noqa: F401

        return True
    except ImportError:
        return False


def test_delta_gate_matches_documentation():
    gated = {
        str(p.relative_to(REPO))
        for p in (REPO / "tests").glob("test_*.py")
        if re.search(r"importorskip\(\s*['\"]delta", p.read_text())
    }
    assert gated == DOCUMENTED_DELTA_GATED, (
        "delta-gated suites drifted from DEPLOYMENT.md: "
        f"found {sorted(gated)}, documented {sorted(DOCUMENTED_DELTA_GATED)}"
    )


def test_deployment_doc_reflects_sandbox_state():
    doc = (REPO / "DEPLOYMENT.md").read_text()
    assert "test_state_delta.py" in doc
    if _delta_available():
        # the gate note claims the sandbox lacks delta-spark; if that
        # ever changes, the doc (and the skip expectation in the verdict
        # bookkeeping) must be refreshed
        raise AssertionError(
            "delta-spark is importable here — update DEPLOYMENT.md: the "
            "'ships no delta-spark' claim and the 1-skip expectation are stale"
        )
