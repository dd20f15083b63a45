"""Differential fuzzing: random JQL predicate trees run through the Spark
compiler and, independently translated, through DuckDB over the same
fixture derivation — the sqllogictest-style randomized oracle check the
reference's hand-picked test matrix never had. Any divergence in the
matched key set is a compiler bug."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from jira_cdc_git_spark import fixtures as FX
from jira_cdc_git_spark import jql as J

# (jql_field, sql_column, value domain) — categorical domains with both
# hitting and missing values so predicates are selective in both directions
ATOMS = [
    ("project", "project_key", ["PROJ", "BENCH", "MEM", "NOPE"]),
    ("status", "status_name", ["To Do", "In Progress", "Done", "Closed", "Ghost"]),
    ("type", "issuetype", ["Epic", "Story", "Bug", "Task", "Missing"]),
    ("priority", "priority", ["Blocker", "Critical", "High", "Medium", "Low"]),
]


@st.composite
def predicate(draw, depth=0):
    if depth >= 2 or draw(st.booleans()):
        fld, col, domain = draw(st.sampled_from(ATOMS))
        val = draw(st.sampled_from(domain))
        kind = draw(st.sampled_from(["eq", "ne", "in"]))
        if kind == "eq":
            return f'{fld} = "{val}"', f"{col} = '{val}'"
        if kind == "ne":
            return f'{fld} != "{val}"', f"{col} <> '{val}'"
        vals = draw(
            st.lists(st.sampled_from(domain), min_size=1, max_size=3, unique=True)
        )
        jql_vals = ", ".join(f'"{v}"' for v in vals)
        sql_vals = ", ".join(f"'{v}'" for v in vals)
        return f"{fld} IN ({jql_vals})", f"{col} IN ({sql_vals})"
    left_j, left_s = draw(predicate(depth=depth + 1))
    right_j, right_s = draw(predicate(depth=depth + 1))
    op = draw(st.sampled_from(["AND", "OR"]))
    neg = draw(st.booleans())
    jql = f"({left_j} {op} {right_j})"
    sql = f"({left_s} {op} {right_s})"
    return (f"NOT {jql}", f"NOT {sql}") if neg else (jql, sql)


@pytest.fixture(scope="module")
def cached_issues(spark, sf_dir):
    df = FX.issues(spark, sf_dir).select(
        "key", "project_key", "status", "issuetype", "priority"
    )
    df = df.localCheckpoint()
    return df


@given(predicate())
@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_random_predicate_matches_duckdb(cached_issues, ddb, expr):
    jql, sql = expr
    spark_keys = {
        r["key"] for r in J.run_jql(jql, cached_issues).select("key").collect()
    }
    oracle = ddb.execute(
        f"WITH {FX.duckdb_issues_cte()} SELECT key FROM issues_flat WHERE {sql}"
    ).fetchall()
    assert spark_keys == {r[0] for r in oracle}, jql


# --- second generator: the harder compiler paths ---------------------------
# relative dates (P13, needs ctx.now), IS [NOT] EMPTY, and `~` contains.

@st.composite
def hard_predicate(draw, depth=0):
    if depth >= 2 or draw(st.booleans()):
        kind = draw(st.sampled_from(["reldate", "empty", "contains", "eq"]))
        if kind == "reldate":
            n = draw(st.sampled_from([7, 30, 90, 365]))
            op = draw(st.sampled_from([">=", "<"]))
            return (
                f"updated {op} -{n}d",
                f"updated {op} TIMESTAMP '2000-01-01 00:00:00' - INTERVAL {n} DAY",
            )
        if kind == "empty":
            fld, col = draw(
                st.sampled_from(
                    [("epic link", "epic_link"), ("parent", "parent_issue"),
                     ("assignee", "assignee_name")]
                )
            )
            neg = draw(st.booleans())
            jql_fld = f'"{fld}"' if " " in fld else fld
            return (
                f"{jql_fld} IS {'NOT ' if neg else ''}EMPTY",
                f"{col} IS {'NOT ' if neg else ''}NULL",
            )
        if kind == "contains":
            needle = draw(st.sampled_from(["Epic", "Issue", "PROJ", "zzz"]))
            return (
                f'summary ~ "{needle}"',
                f"contains(summary, '{needle}')",
            )
        fld, col, domain = draw(st.sampled_from(ATOMS))
        val = draw(st.sampled_from(domain))
        return f'{fld} = "{val}"', f"{col} = '{val}'"
    left_j, left_s = draw(hard_predicate(depth=depth + 1))
    right_j, right_s = draw(hard_predicate(depth=depth + 1))
    op = draw(st.sampled_from(["AND", "OR"]))
    return f"({left_j} {op} {right_j})", f"({left_s} {op} {right_s})"


@pytest.fixture(scope="module")
def cached_issues_full(spark, sf_dir):
    return FX.issues(spark, sf_dir).localCheckpoint()


@given(hard_predicate())
@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_hard_predicate_matches_duckdb(cached_issues_full, ddb, expr):
    from jira_cdc_git_spark.operators.jira import FIXED_NOW

    jql, sql = expr
    ctx = J.JQLContext(now=FIXED_NOW)
    spark_keys = {
        r["key"]
        for r in J.run_jql(jql, cached_issues_full, ctx).select("key").collect()
    }
    oracle = ddb.execute(
        f"WITH {FX.duckdb_issues_cte()} SELECT key FROM issues_flat WHERE {sql}"
    ).fetchall()
    assert spark_keys == {r[0] for r in oracle}, jql
