"""SURVEY prose artifact-number discipline (r10 verdict task 3).

Three consecutive rounds, SURVEY.md cited per-query timings from a
superseded bench artifact (r10: LPA "4.88 s" vs the committed 5.27,
Spearman "1.10 s" vs 1.62, "in-window ivf_topk" when ivf_topk was not
in the r10 window). Hand-maintained numbers drift; so SURVEY now cites
committed artifact timings with a MACHINE-CHECKABLE token:

    `<query_name>=<seconds>s@r<NN>`

and this test extracts every token and asserts it equals the committed
BENCH_LOCAL_r{NN}.json value at the token's own precision. A timing
claim about an artifact that is not written as a token is invisible to
this test — the SURVEY convention (documented next to the tokens) is
that artifact-sourced per-query numbers MUST use the token form.
"""

import json
import os
import re

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TOKEN = re.compile(r"`([a-z0-9_]+)=([0-9]+\.[0-9]+)s@r(\d+)`")
# sf1 scale-probe ratio claims (unitless): `name=N.NNx@rNN` resolves
# via payload["sf1"]["ratio_vs_base"][name] (r11 verdict task: extend
# the token discipline beyond per-query seconds)
RATIO_TOKEN = re.compile(r"`([a-z0-9_]+)=([0-9]+\.[0-9]+)x@r(\d+)`")
# composed-sync metrics live under payload["sync"][name]["sec"], not
# payload["queries"]
SYNC_PREFIXES = ("sync_", "git_materialize", "git_fan_out", "admission_")


def _survey() -> str:
    with open(os.path.join(REPO, "SURVEY.md")) as fh:
        return fh.read()


def _committed_artifact(rnd: int) -> dict:
    """The tokens pin the COMMITTED bench artifact. The round driver
    re-runs bench post-commit and overwrites the worktree copy, so
    reading the worktree file makes the suite fail on a clean checkout
    whose only dirt is the driver's own re-run (r11 verdict
    What's-wrong #1). Prefer `git show HEAD:<file>`; fall back to the
    worktree copy when the file is not yet committed (mid-round, the
    freshly produced artifact of the CURRENT round) or git is absent."""
    import subprocess

    name = f"BENCH_LOCAL_r{rnd:02d}.json"
    try:
        blob = subprocess.run(
            ["git", "show", f"HEAD:{name}"],
            cwd=REPO,
            capture_output=True,
            timeout=30,
        )
        if blob.returncode == 0:
            return json.loads(blob.stdout)
    except (OSError, subprocess.TimeoutExpired, ValueError):
        pass
    art = os.path.join(REPO, name)
    if not os.path.exists(art):
        pytest.fail(f"token cites r{rnd} but {name} is neither committed "
                    "nor in the worktree")
    with open(art) as fh:
        return json.load(fh)


def test_survey_timing_tokens_match_committed_artifacts():
    tokens = TOKEN.findall(_survey())
    assert len(tokens) >= 3, (
        "the corrected r10 claims (benford/LPA/spearman) must be cited "
        "as machine-checkable tokens"
    )
    for name, cited, rnd in tokens:
        payload = _committed_artifact(int(rnd))
        if name.startswith(SYNC_PREFIXES):
            sync = payload.get("sync", {})
            assert name in sync, f"{name} not in r{rnd} sync block"
            actual = sync[name]["sec"]
        else:
            queries = payload["queries"]
            assert name in queries, f"{name} not in r{rnd} queries"
            actual = queries[name]
        decimals = len(cited.split(".")[1])
        assert round(actual, decimals) == float(cited), (
            f"SURVEY cites {name}={cited}s@r{rnd} but the committed "
            f"artifact reads {actual} — update the prose or "
            "re-run bench"
        )


def test_survey_ratio_tokens_match_committed_artifacts():
    tokens = RATIO_TOKEN.findall(_survey())
    assert len(tokens) >= 1, (
        "probe-ratio claims must be cited as machine-checkable "
        "`name=N.NNx@rNN` tokens (r11 verdict What's-wrong #4)"
    )
    for name, cited, rnd in tokens:
        payload = _committed_artifact(int(rnd))
        ratios = payload.get("sf1", {}).get("ratio_vs_base", {})
        assert name in ratios, f"{name} not in r{rnd} sf1.ratio_vs_base"
        decimals = len(cited.split(".")[1])
        assert round(ratios[name], decimals) == float(cited), (
            f"SURVEY cites {name}={cited}x@r{rnd} but the committed "
            f"probe reads {ratios[name]}"
        )


def test_survey_retired_stale_claims_stay_gone():
    s = _survey()
    # the exact three drift instances the r10 verdict flagged
    assert "committed 4.88 s" not in s
    assert "(1.10 s)" not in s
    assert "re-proven by in-window ivf_topk" not in s
