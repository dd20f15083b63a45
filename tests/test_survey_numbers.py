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


def _survey() -> str:
    with open(os.path.join(REPO, "SURVEY.md")) as fh:
        return fh.read()


def test_survey_timing_tokens_match_committed_artifacts():
    tokens = TOKEN.findall(_survey())
    assert len(tokens) >= 3, (
        "the corrected r10 claims (benford/LPA/spearman) must be cited "
        "as machine-checkable tokens"
    )
    for name, cited, rnd in tokens:
        art = os.path.join(REPO, f"BENCH_LOCAL_r{int(rnd):02d}.json")
        if not os.path.exists(art):
            pytest.fail(f"token cites r{rnd} but {art} does not exist")
        with open(art) as fh:
            queries = json.load(fh)["queries"]
        assert name in queries, f"{name} not in {os.path.basename(art)}"
        decimals = len(cited.split(".")[1])
        assert round(queries[name], decimals) == float(cited), (
            f"SURVEY cites {name}={cited}s@r{rnd} but the committed "
            f"artifact reads {queries[name]} — update the prose or "
            "re-run bench"
        )


def test_survey_retired_stale_claims_stay_gone():
    s = _survey()
    # the exact three drift instances the r10 verdict flagged
    assert "committed 4.88 s" not in s
    assert "(1.10 s)" not in s
    assert "re-proven by in-window ivf_topk" not in s
