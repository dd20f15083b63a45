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


# --- third generator: history operators (WAS / CHANGED) --------------------
# Random history predicates vs an independently-written SQL translation
# over the same changelog derivation — the interval semantics (lead-based
# end_at, creation rows, qualifier combinations) is exactly where a
# compiler bug would hide.

_HIST_DATES = [
    "1993-06-01", "1995-01-01", "1996-06-15", "1998-01-01", "2000-01-01",
]
_STATUS_VALUES = [
    "Open", "In Progress", "In Review", "To Do", "Done", "Closed", "Ghost",
]
_AUTHORS = ["user0", "user7", "user12", "user31", "nobody"]

_IV_CTE = (
    "iv AS (SELECT key, field, from_value, to_value, author, changed_at, "
    "lead(changed_at) OVER (PARTITION BY key, field ORDER BY changed_at) "
    "AS end_at FROM changelog)"
)


@st.composite
def history_predicate(draw):
    mode = draw(st.sampled_from(["was", "changed"]))
    negated = draw(st.booleans()) if mode == "was" else False
    by = draw(st.sampled_from([None, *_AUTHORS]))
    after = draw(st.sampled_from([None, *_HIST_DATES]))
    before = draw(st.sampled_from([None, *_HIST_DATES]))
    during = None
    if draw(st.booleans()):
        d1, d2 = sorted(draw(
            st.lists(st.sampled_from(_HIST_DATES), min_size=2, max_size=2,
                     unique=True)
        ))
        during = (d1, d2)
    quals_j, conds = [], ["iv.field = 'status'"]
    if by:
        quals_j.append(f'BY "{by}"')
        conds.append(f"iv.author = '{by}'")
    if after:
        quals_j.append(f'AFTER "{after}"')
    if before:
        quals_j.append(f'BEFORE "{before}"')
        conds.append(f"iv.changed_at < TIMESTAMP '{before}'")
    if during:
        quals_j.append(f'DURING ("{during[0]}", "{during[1]}")')
    if mode == "was":
        vals = draw(
            st.lists(st.sampled_from(_STATUS_VALUES), min_size=1, max_size=3,
                     unique=True)
        )
        conds.append(
            "(" + " OR ".join(f"iv.to_value = '{v}'" for v in vals) + ")"
        )
        if after:
            conds.append(
                f"(iv.end_at IS NULL OR iv.end_at > TIMESTAMP '{after}')"
            )
        if during:
            conds.append(f"iv.changed_at <= TIMESTAMP '{during[1]}'")
            conds.append(
                f"(iv.end_at IS NULL OR iv.end_at > TIMESTAMP '{during[0]}')"
            )
        rhs = (
            "IN (" + ", ".join(f'"{v}"' for v in vals) + ")"
            if len(vals) > 1
            else f'"{vals[0]}"'
        )
        jql = f"status WAS {'NOT ' if negated else ''}{rhs}"
    else:
        conds.append("iv.from_value IS NOT NULL")
        frm = draw(st.sampled_from([None, *_STATUS_VALUES]))
        to = draw(st.sampled_from([None, *_STATUS_VALUES]))
        jql = "status CHANGED"
        if frm:
            jql += f' FROM "{frm}"'
            conds.append(f"iv.from_value = '{frm}'")
        if to:
            jql += f' TO "{to}"'
            conds.append(f"iv.to_value = '{to}'")
        if after:
            conds.append(f"iv.changed_at > TIMESTAMP '{after}'")
        if during:
            conds.append(f"iv.changed_at >= TIMESTAMP '{during[0]}'")
            conds.append(f"iv.changed_at <= TIMESTAMP '{during[1]}'")
    if quals_j:
        jql += " " + " ".join(quals_j)
    ex = (
        "EXISTS (SELECT 1 FROM iv WHERE iv.key = i.key AND "
        + " AND ".join(conds)
        + ")"
    )
    return jql, (f"NOT {ex}" if negated else ex)


@pytest.fixture(scope="module")
def hist_ctx(spark, sf_dir, cached_issues):
    return J.JQLContext(
        issues=cached_issues,
        changelog=FX.changelog(spark, sf_dir).localCheckpoint(),
    )


@given(history_predicate())
@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_random_history_predicate_matches_duckdb(
    cached_issues, hist_ctx, ddb, expr
):
    jql, sql = expr
    spark_keys = {
        r["key"]
        for r in J.run_jql(jql, cached_issues, hist_ctx).select("key").collect()
    }
    oracle = ddb.execute(
        f"WITH {FX.duckdb_issues_cte()}, {FX.duckdb_changelog_cte()},"
        f" {_IV_CTE} SELECT key FROM issues_flat i WHERE {sql}"
    ).fetchall()
    assert spark_keys == {r[0] for r in oracle}, jql
