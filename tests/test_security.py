"""P17 security-validation tests — the attack corpus every admission row
must quarantine (reference: crds/v1alpha1/tests/security/
jirasync-security-tests.yaml, 15 attack-scenario manifests that must FAIL
admission; rules internal/api/crd_converter.go:226-352)."""

from pyspark.sql import functions as F

from jira_cdc_git_spark.operators.security import (
    validate_requests,
    validate_requests_df,
)

GOOD = ("repos/PROJ/PROJ-1", "https://jira.example.com/browse/PROJ-1",
        'project = "PROJ" AND key = "PROJ-1"')

# (request_id, repo_path, jira_url, jql, expected_reason)
ATTACKS = [
    ("path-traversal", "../../../etc/passwd", GOOD[1], GOOD[2], "bad_path"),
    ("path-traversal-mid", "repos/../../etc/shadow", GOOD[1], GOOD[2], "bad_path"),
    ("path-absolute", "/etc/passwd", GOOD[1], GOOD[2], "bad_path"),
    ("path-space", "repos/PROJ/ evil", GOOD[1], GOOD[2], "bad_path"),
    ("path-empty", "", GOOD[1], GOOD[2], "bad_path"),
    ("path-overlong", "r/" + "a" * 250, GOOD[1], GOOD[2], "bad_path"),
    ("url-http", "http://jira.example.com", GOOD[2], None, "bad_url"),
    ("url-javascript", "javascript:alert(1)", GOOD[2], None, "bad_url"),
    ("url-file", "file:///etc/passwd", GOOD[2], None, "bad_url"),
    ("url-space", "https://jira.example.com/a b", GOOD[2], None, "bad_url"),
    ("url-overlong", "https://" + "a" * 2100, GOOD[2], None, "bad_url"),
    ("jql-injection-semicolon", None, None,
     "project = PROJ; DROP TABLE issues", "bad_jql"),
    ("jql-comment-injection", None, None, "project = PROJ -- comment",
     "bad_jql"),
    ("jql-unbalanced-quote", None, None, 'summary ~ "unbalanced', "bad_jql"),
    ("jql-too-short", None, None, "k<5", "bad_jql"),
    ("jql-overlong", None, None, "key IN (" + "x," * 600 + ")", "bad_jql"),
]


def _mk_rows():
    rows = []
    for rid, path, url, jql, reason in ATTACKS:
        # slot the attack into its field; other fields stay well-formed
        if reason == "bad_path":
            rows.append((rid, path, GOOD[1], GOOD[2], reason))
        elif reason == "bad_url":
            rows.append((rid, GOOD[0], path, GOOD[2], reason))
        else:
            rows.append((rid, GOOD[0], GOOD[1], jql, reason))
    rows.append(("benign", *GOOD, None))
    return rows


def test_attack_corpus_all_quarantined(spark):
    df = spark.createDataFrame(
        _mk_rows(),
        "request_id string, repo_path string, jira_url string, jql string,"
        "expected_reason string",
    )
    out = validate_requests_df(spark, df.drop("expected_reason")).join(
        df.select("request_id", "expected_reason"), "request_id"
    )
    rows = {r["request_id"]: r for r in out.collect()}
    assert len(rows) == len(ATTACKS) + 1
    for rid, r in rows.items():
        if rid == "benign":
            assert r["valid"] and r["reason"] is None
        else:
            assert not r["valid"], f"{rid} not quarantined"
            assert r["reason"] == r["expected_reason"], rid


def test_fixture_query_quarantines_and_keeps_rows(spark, sf_dir):
    out = validate_requests(spark, sf_dir)
    agg = out.agg(
        F.count("*").alias("n"),
        F.sum(F.col("valid").cast("int")).alias("n_valid"),
    ).first()
    # quarantine posture: no row dropped, both verdicts present
    assert agg["n"] > 0 and 0 < agg["n_valid"] < agg["n"]
    reasons = {
        r["reason"]
        for r in out.filter(~F.col("valid")).select("reason").distinct().collect()
    }
    assert reasons == {"bad_path", "bad_url", "bad_jql"}


def test_validation_is_narrow_plan(spark, sf_dir):
    # P17 must stay a scan-stage projection: no exchange, no UDF
    plan = (
        validate_requests(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
