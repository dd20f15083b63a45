"""P17 — security/constraint validation of sync requests (reference:
``validateRepositorySecure`` / ``validateJQLSecure`` / ``validateURLSecure``,
internal/api/crd_converter.go:226-352, plus the admission attack corpus
crds/v1alpha1/tests/security/jirasync-security-tests.yaml).

The reference REJECTS a request at the API/admission boundary; the engine's
posture is QUARANTINE: every request row gets per-rule boolean columns, a
``valid`` verdict and a first-failing ``reason`` — malformed rows are kept
and flagged, never silently dropped (same posture as F4 timestamp
quarantine).

Everything is written in a dialect-shared SQL subset (``||``, CASE, length,
instr, substr, replace, repeat) that runs verbatim on Spark and DuckDB, so
the driver's hash comparison is exact. All rules are built-in string
expressions — no UDF, narrow projection, zero shuffle: at 100 TB this is a
free pass folded into the ingest scan.

Rules (mirroring crd_converter.go:226-352):
  repo path — non-empty, ≤200 chars, no ``..`` traversal, not absolute,
      no whitespace (the reference also rejects these before filepath use).
  URL — https scheme only (allowlist), ≤2048 chars, no spaces.
  JQL — length in [5, 1000] (handlers_sync.go:208-227 lower bound), no
      ``;`` statement injection, no ``--`` comment injection, balanced
      double quotes (pkg/jql/builder.go:267-321 lint).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from jira_cdc_git_spark import fixtures as FX


def requests_sql(flat: str) -> str:
    """Deterministic sync-request fixture derived from the flat issue frame:
    mostly well-formed requests with attack-shaped rows injected on fixed
    residues (traversal, absolute path, embedded space, http/javascript
    schemes, overlong URL, JQL injection, unbalanced quote, overlong and
    undersized JQL) — one fixture row per issue."""
    return f"""
        SELECT k,
               key AS request_id,
               CASE WHEN k % 23 = 1 THEN '../../../etc/passwd'
                    WHEN k % 23 = 2 THEN '/abs/' || key
                    WHEN k % 23 = 3 THEN 'repos/' || project_key || '/ bad path'
                    ELSE 'repos/' || project_key || '/' || key END AS repo_path,
               CASE WHEN k % 29 = 1
                      THEN 'http://jira.example.com/browse/' || key
                    WHEN k % 29 = 2 THEN 'javascript:alert(1)'
                    WHEN k % 29 = 3 THEN 'https://' || repeat('a', 2100)
                    ELSE 'https://jira.example.com/browse/' || key
                    END AS jira_url,
               CASE WHEN k % 31 = 1
                      THEN 'project = ' || project_key || '; DROP TABLE issues'
                    WHEN k % 31 = 2 THEN 'summary ~ "unbalanced'
                    WHEN k % 31 = 3 THEN 'key IN (' || repeat('x,', 600) || ')'
                    WHEN k % 31 = 4 THEN 'k<5'
                    ELSE 'project = "' || project_key
                         || '" AND key = "' || key || '"' END AS jql
        FROM ({flat}) _f
    """


def validate_sql(requests: str) -> str:
    """Per-rule validation columns over a request relation — shared dialect."""
    return f"""
        SELECT request_id, repo_path, jira_url, jql,
               path_ok, url_ok, jql_ok,
               (path_ok AND url_ok AND jql_ok) AS valid,
               CASE WHEN NOT path_ok THEN 'bad_path'
                    WHEN NOT url_ok THEN 'bad_url'
                    WHEN NOT jql_ok THEN 'bad_jql' END AS reason
        FROM (
            SELECT request_id, repo_path, jira_url, jql,
                   (length(repo_path) > 0 AND length(repo_path) <= 200
                    AND instr(repo_path, '..') = 0
                    AND substr(repo_path, 1, 1) <> '/'
                    AND instr(repo_path, ' ') = 0) AS path_ok,
                   (length(jira_url) <= 2048
                    AND substr(jira_url, 1, 8) = 'https://'
                    AND instr(jira_url, ' ') = 0) AS url_ok,
                   (length(jql) >= 5 AND length(jql) <= 1000
                    AND instr(jql, ';') = 0
                    AND instr(jql, '--') = 0
                    AND (length(jql) - length(replace(jql, '"', ''))) % 2 = 0)
                     AS jql_ok
            FROM ({requests}) _r
        ) _v
    """


def validate_requests(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P17 — the oracle-checked quarantine query: request fixture + rule
    columns. Narrow string expressions only; Catalyst folds the whole thing
    into the scan stage (WholeStageCodegen, no exchange)."""
    flat = FX.issues_flat(spark, sf_dir)
    flat.createOrReplaceTempView("_p17_issues_flat")
    return spark.sql(
        validate_sql(requests_sql("SELECT * FROM _p17_issues_flat"))
    )


def validate_requests_df(spark: SparkSession, requests: DataFrame) -> DataFrame:
    """Validate an arbitrary request frame (request_id, repo_path, jira_url,
    jql) — the entry the attack-corpus test and a real admission layer use."""
    requests.createOrReplaceTempView("_p17_requests")
    return spark.sql(validate_sql("SELECT * FROM _p17_requests"))


def oracle(issues_cte: str) -> str:
    """DuckDB oracle: the SAME shared SQL over the issues_flat CTE."""
    return (
        f"WITH {issues_cte} "
        + validate_sql(requests_sql("SELECT * FROM issues_flat"))
    )
