"""Bench-artifact integrity (r9 verdict task 2, carried to r11).

Three consecutive rounds (r8 LPA fusion, r9 threshold-curve, r10
Spearman rewrite) shipped an operator-code commit AFTER the round's
final bench artifact, so the committed numbers measured code that no
longer existed. bench.py now stamps ``git_sha``/``git_dirty`` into the
payload; this test asserts, for every committed BENCH_LOCAL artifact
that carries the stamp (r11+):

  1. the artifact was produced from a CLEAN operator tree
     (``git_dirty`` false — no uncommitted edits to
     jira_cdc_git_spark/, __spark_entry__.py, or bench.py), and
  2. the last commit that touched any operator-code path is an
     ancestor of (or equal to) the artifact's sha — i.e. the artifact
     measured shipped code, and no operator commit landed after it.

The test fails the moment operator code lands after the newest
artifact, which is exactly the late-commit pattern it exists to kill:
re-run bench.py (sf0.1) on the committed code to fix it.
"""

import glob
import json
import os
import re
import subprocess

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CODE_PATHS = ["jira_cdc_git_spark", "__spark_entry__.py", "bench.py"]


def _git(*args: str) -> subprocess.CompletedProcess:
    return subprocess.run(
        ["git", *args], cwd=REPO, capture_output=True, text=True
    )


def _stamped_artifacts():
    out = []
    for f in sorted(glob.glob(os.path.join(REPO, "BENCH_LOCAL_r*.json"))):
        with open(f) as fh:
            payload = json.load(fh)
        if "git_sha" in payload:
            out.append((os.path.basename(f), payload))
    return out


def test_committed_bench_artifact_measures_shipped_code():
    arts = _stamped_artifacts()
    if not arts:
        pytest.skip("no git_sha-stamped BENCH_LOCAL artifact yet (pre-r11)")
    # only the NEWEST stamped artifact is the live contract: older ones
    # are historical records whose shas stay valid by construction.
    name, payload = max(
        arts, key=lambda kv: int(re.search(r"_r(\d+)", kv[0]).group(1))
    )
    sha, dirty = payload["git_sha"], payload["git_dirty"]
    assert sha, f"{name}: git_sha missing/null — bench ran outside git?"
    assert dirty is False, (
        f"{name}: artifact was produced from a DIRTY operator tree; "
        "commit the code first, then re-run bench.py"
    )
    assert _git("cat-file", "-e", f"{sha}^{{commit}}").returncode == 0, (
        f"{name}: git_sha {sha} is not a commit in this repository"
    )
    last_code = _git(
        "log", "-1", "--format=%H", "HEAD", "--", *CODE_PATHS
    ).stdout.strip()
    assert last_code, "no commit touches the operator code paths?"
    ancestor = _git("merge-base", "--is-ancestor", last_code, sha)
    assert ancestor.returncode == 0, (
        f"{name}: operator code commit {last_code[:12]} landed AFTER the "
        f"bench artifact (sha {sha[:12]}) — the committed numbers measure "
        "stale code. Re-run bench.py at sf0.1 on HEAD and commit the "
        "refreshed artifact (r9 verdict task 2)."
    )


def test_stamped_artifacts_carry_sentinels():
    for name, payload in _stamped_artifacts():
        s = payload.get("sentinels")
        assert s and s.get("first") and s.get("last"), (
            f"{name}: missing the first/last sentinel pair (r10 task 10)"
        )
        assert set(s["first"]) == set(s["last"])
        assert s.get("drift_ratio_median") is not None
