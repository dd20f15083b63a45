"""Unit tests for the JQL-subset compiler (parser, validator, templates,
compilation semantics against a tiny in-memory issues frame)."""

import pytest
from pyspark.sql import functions as F

from jira_cdc_git_spark import jql as J


# ---------------------------------------------------------------------------
# Validation lint (F9 — quote/paren balance, dup operators)
# ---------------------------------------------------------------------------

def test_validate_clean():
    assert J.validate('project = PROJ AND status != "Done"') == []


@pytest.mark.parametrize(
    "bad,msg",
    [
        ('status = "unclosed', "unbalanced quotes"),
        ("(a = 1 AND (b = 2)", "unbalanced parentheses"),
        ("a = 1) OR (b = 2", "unbalanced parentheses"),
        ("a = 1 AND AND b = 2", "duplicated boolean operator"),
        ("", "empty query"),
    ],
)
def test_validate_rejects(bad, msg):
    assert any(msg in e for e in J.validate(bad))


def test_escaped_quote_is_balanced():
    assert J.validate(r'summary ~ "say \"hi\""') == []


def test_parens_inside_quotes_ignored():
    # the reference's raw count-based check rejects these (builder.go:267-290
    # counts parens inside strings); our scanner skips quoted regions
    assert J.validate('summary ~ ":-)"') == []
    assert J.validate("summary ~ '((('") == []
    assert J.validate('(summary ~ ")") AND project = P') == []
    # still rejects genuine imbalance around quoted parens
    assert any(
        "parentheses" in e for e in J.validate('(summary ~ ":-)"')
    )


# ---------------------------------------------------------------------------
# Parser
# ---------------------------------------------------------------------------

def test_parse_order_by():
    q = J.parse("project = P ORDER BY key ASC, updated DESC")
    assert q.order_by == [("key", "ASC"), ("updated", "DESC")]


def test_parse_in_list():
    q = J.parse('status IN ("To Do", "In Progress")')
    assert isinstance(q.where, J.InList)
    assert q.where.values == ["To Do", "In Progress"]


def test_parse_not_in():
    q = J.parse("status NOT IN (Closed, Done)")
    assert q.where.negated


def test_parse_membership_function():
    q = J.parse('parent IN (issuesInEpic("PROJ-1"))')
    assert isinstance(q.where, J.Membership)
    assert q.where.func == "issuesinepic"
    assert q.where.arg == "PROJ-1"


def test_parse_quoted_field_and_cf():
    q = J.parse('"Epic Link" = PROJ-1 AND cf[12311140] = PROJ-1')
    assert isinstance(q.where, J.Bool)
    assert q.where.children[0].fld == "epic link"
    assert q.where.children[1].fld == "cf[12311140]"


def test_parse_reldate():
    q = J.parse("updated >= -30d")
    assert q.where.value == ("reldate", "-30d")


def test_parse_error_trailing():
    with pytest.raises(J.JQLError):
        J.parse("project = P garbage garbage")


# ---------------------------------------------------------------------------
# Templates (P18)
# ---------------------------------------------------------------------------

def test_template_instantiation():
    jql = J.build_from_template("project-active-issues", {"project": "MEM"})
    assert "project = MEM" in jql
    assert "NOT IN" in jql


def test_template_missing_required():
    with pytest.raises(J.JQLError, match="missing required param"):
        J.build_from_template("epic-all-issues")
    with pytest.raises(J.JQLError, match="unknown template"):
        J.build_from_template("nope")


def test_template_defaults():
    jql = J.build_from_template("recent-updates", {"project": "X"})
    assert "-7d" in jql  # default days


# ---------------------------------------------------------------------------
# Compilation semantics on a tiny frame
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def tiny(spark):
    rows = [
        ("P-1", "P", "Epic", "To Do", None, None, "alice"),
        ("P-2", "P", "Story", "In Progress", "P-1", None, "bob"),
        ("P-3", "P", "Story", "Done", "P-1", None, "alice"),
        ("P-4", "P", "Sub-task", "To Do", None, "P-2", None),
        ("Q-1", "Q", "Story", "Closed", None, None, "alice"),
    ]
    df = spark.createDataFrame(
        rows,
        "key string, project_key string, issuetype string, sname string,"
        "epic_link string, parent_issue string, aname string",
    )
    return df.select(
        "key",
        "project_key",
        "issuetype",
        F.struct(F.col("sname").alias("name"), F.lit("x").alias("category")).alias("status"),
        "epic_link",
        "parent_issue",
        F.struct(F.col("aname").alias("name"), F.lit("e").alias("email")).alias("assignee"),
    )


def _keys(df):
    return sorted(r["key"] for r in df.collect())


def test_compile_equality_and_in(tiny):
    out = J.run_jql('project = P AND status IN ("To Do", "Done")', tiny)
    assert _keys(out) == ["P-1", "P-3", "P-4"]


def test_compile_not_and_neq(tiny):
    out = J.run_jql('project = P AND NOT status = "Done"', tiny)
    assert _keys(out) == ["P-1", "P-2", "P-4"]


def test_compile_or_with_membership(tiny):
    ctx = J.JQLContext(issues=tiny)
    out = J.run_jql(
        '"Epic Link" = P-1 OR parent IN (issuesInEpic("P-1"))', tiny, ctx
    )
    # P-2, P-3 via epic link; P-4 via parent P-2 ∈ members
    assert _keys(out) == ["P-2", "P-3", "P-4"]


def test_compile_current_user(tiny):
    ctx = J.JQLContext(current_user="alice")
    out = J.run_jql("assignee = currentUser()", tiny, ctx)
    assert _keys(out) == ["P-1", "P-3", "Q-1"]


def test_compile_is_empty(tiny):
    out = J.run_jql("assignee IS EMPTY", tiny)
    assert _keys(out) == ["P-4"]
    out = J.run_jql("epic IS NOT EMPTY".replace("epic", '"Epic Link"'), tiny)
    assert _keys(out) == ["P-2", "P-3"]


def test_compile_linked_issues(tiny, spark):
    links = spark.createDataFrame(
        [("P-1", "P-2"), ("P-1", "Q-1")], "src_key string, dst_key string"
    )
    ctx = J.JQLContext(links=links)
    out = J.run_jql('issue IN (linkedIssues("P-1"))', tiny, ctx)
    assert _keys(out) == ["P-2", "Q-1"]


def test_compile_order_by(tiny):
    out = J.run_jql("project = P ORDER BY key DESC", tiny)
    assert [r["key"] for r in out.collect()] == ["P-4", "P-3", "P-2", "P-1"]


def test_missing_context_errors(tiny):
    with pytest.raises(J.JQLError, match="ctx.now"):
        J.run_jql("updated >= -7d", tiny)
    with pytest.raises(J.JQLError, match="current_user"):
        J.run_jql("assignee = currentUser()", tiny)


# --- emit / optimize_query (§4.1 OptimizeQuery parity) ---------------------

def test_optimize_moves_project_first_and_appends_order():
    out, notes = J.optimize_query('status = Done AND project = PROJ')
    assert out == "project = PROJ AND status = Done ORDER BY key ASC"
    assert "moved project filter first" in notes
    assert "appended ORDER BY key ASC" in notes


def test_optimize_keeps_existing_order_and_position():
    out, notes = J.optimize_query("project = P AND status = Done ORDER BY updated DESC")
    assert out == "project = P AND status = Done ORDER BY updated DESC"
    assert notes == []


def test_optimize_applies_or_to_in_with_note():
    out, notes = J.optimize_query("status = A OR status = B OR status = C")
    assert out == "status IN (A, B, C) ORDER BY key ASC"
    assert "consolidated OR chain into IN" in notes


def test_optimize_idempotent():
    out1, _ = J.optimize_query('"Epic Link" = PROJ-0 OR parent IN (issuesInEpic("PROJ-0"))')
    out2, notes2 = J.optimize_query(out1)
    assert out1 == out2
    assert notes2 == []


def test_emit_round_trips_through_parse():
    for jql in [
        'project = MEM AND status NOT IN ("Closed", "Done")',
        '"Epic Link" = P-1 OR parent IN (issuesInEpic("P-1"))',
        "assignee = currentUser() AND sprint IN (openSprints())",
        "updated >= -30d AND NOT (status = Done OR priority = Low) ORDER BY updated DESC, key ASC",
        "summary ~ \"needs space\" AND description IS NOT EMPTY",
    ]:
        q = J.parse(jql)
        assert J.parse(J.emit(q)) == q


# ---------------------------------------------------------------------------
# History operators (WAS / CHANGED over the changelog)
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def hist(spark, tiny):
    """Hand-built changelog for the tiny issues frame: P-2 went
    Open -> In Progress (2021, by alice); P-3 went Open -> In Progress
    (2020) -> Done (2022, by bob); everything else only has its creation
    row (value 'Open' from 2020 until its first transition or forever)."""
    from datetime import datetime

    rows = [
        ("P-1", "status", None, "Open", datetime(2020, 1, 1), "alice"),
        ("P-2", "status", None, "Open", datetime(2020, 1, 1), "alice"),
        ("P-2", "status", "Open", "In Progress", datetime(2021, 1, 1), "alice"),
        ("P-3", "status", None, "Open", datetime(2020, 1, 1), "alice"),
        ("P-3", "status", "Open", "In Progress", datetime(2020, 6, 1), "bob"),
        ("P-3", "status", "In Progress", "Done", datetime(2022, 1, 1), "bob"),
        ("P-4", "status", None, "Open", datetime(2020, 1, 1), "alice"),
        ("Q-1", "status", None, "Open", datetime(2020, 1, 1), "alice"),
        ("Q-1", "assignee", None, "carol", datetime(2020, 1, 1), "alice"),
        ("Q-1", "assignee", "carol", "alice", datetime(2021, 6, 1), "carol"),
    ]
    cl = spark.createDataFrame(
        rows,
        "key string, field string, from_value string, to_value string,"
        "changed_at timestamp, author string",
    )
    return J.JQLContext(issues=tiny, changelog=cl)


def test_was_basic(tiny, hist):
    out = J.run_jql('status WAS "In Progress"', tiny, hist)
    assert _keys(out) == ["P-2", "P-3"]


def test_was_not(tiny, hist):
    out = J.run_jql('status WAS NOT "In Progress"', tiny, hist)
    assert _keys(out) == ["P-1", "P-4", "Q-1"]


def test_was_in_list_and_compose(tiny, hist):
    out = J.run_jql('status WAS IN ("Done", "In Progress") AND project = P', tiny, hist)
    assert _keys(out) == ["P-2", "P-3"]


def test_was_by(tiny, hist):
    out = J.run_jql('status WAS "In Progress" BY bob', tiny, hist)
    assert _keys(out) == ["P-3"]


def test_was_before_uses_interval_start(tiny, hist):
    # P-2 reached In Progress only in 2021 — a BEFORE 2020-12-31 cutoff
    # must keep P-3 (reached 2020-06-01) and drop P-2
    out = J.run_jql('status WAS "In Progress" BEFORE "2020-12-31"', tiny, hist)
    assert _keys(out) == ["P-3"]


def test_was_after_uses_interval_end(tiny, hist):
    # "still Open after 2020-09-01": P-3 left Open on 2020-06-01 — out;
    # P-2 left on 2021-01-01, everyone else holds Open forever — in
    out = J.run_jql('status WAS "Open" AFTER "2020-09-01"', tiny, hist)
    assert _keys(out) == ["P-1", "P-2", "P-4", "Q-1"]


def test_changed_any(tiny, hist):
    out = J.run_jql("status CHANGED", tiny, hist)
    assert _keys(out) == ["P-2", "P-3"]


def test_changed_from_to_after(tiny, hist):
    out = J.run_jql(
        'status CHANGED FROM "In Progress" TO "Done" AFTER "2021-06-01"',
        tiny,
        hist,
    )
    assert _keys(out) == ["P-3"]
    none = J.run_jql(
        'status CHANGED TO "Done" AFTER "2022-06-01"', tiny, hist
    )
    assert _keys(none) == []


def test_changed_other_field(tiny, hist):
    out = J.run_jql("assignee CHANGED", tiny, hist)
    assert _keys(out) == ["Q-1"]


def test_history_emit_roundtrip():
    for q in [
        'status WAS "In Progress" BY bob AFTER "2020-01-01"',
        'status WAS NOT IN (Done, Closed) BEFORE "2021-01-01"',
        "status CHANGED FROM Open TO Done BY alice",
        "assignee CHANGED AFTER -30d",
    ]:
        once = J.emit(J.parse(q))
        assert J.emit(J.parse(once)) == once


def test_history_errors(tiny, hist):
    with pytest.raises(J.JQLError, match="duplicate AFTER"):
        J.parse('status CHANGED AFTER "2020-01-01" AFTER "2021-01-01"')
    with pytest.raises(J.JQLError, match="needs ctx.changelog"):
        J.run_jql("status CHANGED", tiny, J.JQLContext(issues=tiny))


def test_date_functions_resolve():
    from datetime import datetime

    ctx = J.JQLContext(now=datetime(2000, 1, 1, 15, 30))
    assert J._resolve_date_func("startofday", None, ctx) == datetime(2000, 1, 1)
    assert J._resolve_date_func("endofday", None, ctx) == datetime(
        2000, 1, 1, 23, 59, 59
    )
    # 2000-01-01 is a Saturday -> Monday 1999-12-27
    assert J._resolve_date_func("startofweek", None, ctx) == datetime(
        1999, 12, 27
    )
    assert J._resolve_date_func("endofweek", None, ctx) == datetime(
        2000, 1, 2, 23, 59, 59
    )
    assert J._resolve_date_func("startofday", "-1d", ctx) == datetime(
        1999, 12, 31
    )
    with pytest.raises(J.JQLError, match="bad offset"):
        J._resolve_date_func("startofday", "tomorrow", ctx)
    with pytest.raises(J.JQLError, match="without ctx.now"):
        J._resolve_date_func("startofday", None, J.JQLContext())


def test_date_function_emit_roundtrip():
    for q in [
        'updated >= startOfWeek("-2w")',
        "created < endOfDay()",
        'updated >= startOfDay("-1d") AND project = P',
    ]:
        once = J.emit(J.parse(q))
        assert J.emit(J.parse(once)) == once


def test_was_during_interval_overlap(tiny, hist):
    # "held In Progress at some point during 2020": P-3 (from 2020-06-01);
    # P-2 only reached it in 2021 — out
    out = J.run_jql(
        'status WAS "In Progress" DURING ("2020-01-01", "2020-12-31")',
        tiny,
        hist,
    )
    assert _keys(out) == ["P-3"]
    # a window covering both transitions finds both
    both = J.run_jql(
        'status WAS "In Progress" DURING ("2020-01-01", "2021-06-01")',
        tiny,
        hist,
    )
    assert _keys(both) == ["P-2", "P-3"]


def test_changed_during(tiny, hist):
    out = J.run_jql(
        'status CHANGED DURING ("2021-06-01", "2022-06-01")', tiny, hist
    )
    assert _keys(out) == ["P-3"]
    with pytest.raises(J.JQLError, match="expected , in DURING"):
        J.parse('status CHANGED DURING ("2021-06-01")')


def test_optimize_query_preserves_history_terms():
    # the project-first rewrite must move the project conjunct ahead of a
    # history term without dropping its qualifiers, and stay idempotent
    out, notes = J.optimize_query(
        'status WAS "Done" BY bob DURING ("2020-01-01", "2021-01-01")'
        " AND project = PROJ"
    )
    assert out.startswith("project = PROJ AND status WAS Done")
    assert 'DURING ("2020-01-01", "2021-01-01")' in out
    assert "BY bob" in out
    assert "ORDER BY key ASC" in out
    again, _ = J.optimize_query(out)
    assert again == out


def test_optimize_query_preserves_date_functions():
    out, _ = J.optimize_query('updated >= startOfWeek("-2w") AND project = MEM')
    assert out.startswith("project = MEM AND")
    assert 'startOfWeek("-2w")' in out
    again, _ = J.optimize_query(out)
    assert again == out
