"""Saved-query store (pkg/jql/jira_builder.go:276-364 parity): CRUD,
upsert semantics, usage stats, and the load → compile → run round-trip."""

import json
from datetime import datetime

import pytest
from pyspark.sql import functions as F

from jira_cdc_git_spark import jql as JQL
from jira_cdc_git_spark.query_store import SavedQueryStore

T0 = datetime(2024, 5, 1, 12, 0, 0)


@pytest.fixture
def store(tmp_path):
    return SavedQueryStore(str(tmp_path))


def test_save_get_round_trip(store):
    store.save(
        "mine", "my open issues",
        "project = PROJ AND status = Open", parameters={"project": "PROJ"},
        tags=["daily"], now=T0,
    )
    q = store.get("mine")
    assert q["jql"] == "project = PROJ AND status = Open"
    assert q["usage_count"] == 0 and q["created_at"] == T0
    assert q["parameters"] == {"project": "PROJ"} and q["tags"] == ["daily"]
    assert store.list()[0]["name"] == "mine"
    with pytest.raises(KeyError):
        store.get("nope")


def test_save_upsert_keeps_usage(store):
    """SaveQuery's update branch (jira_builder.go:279-292): re-saving a
    name replaces description/jql but preserves usage_count / last_used /
    created_at."""
    store.save("q", "v1", "project = A", now=T0)
    store.record_usage("q", now=datetime(2024, 5, 2))
    store.record_usage("q", now=datetime(2024, 5, 3))
    store.save("q", "v2", "project = B", now=datetime(2024, 6, 1))
    q = store.get("q")
    assert q["description"] == "v2" and q["jql"] == "project = B"
    assert q["usage_count"] == 2
    assert q["last_used"] == datetime(2024, 5, 3)
    assert q["created_at"] == T0
    assert len(store.list()) == 1


def test_invalid_jql_refused(store):
    with pytest.raises(JQL.JQLError):
        store.save("bad", "", "project = ", now=T0)
    assert store.list() == []


def test_usage_bump_and_delete(store):
    store.save("a", "", "project = A", now=T0)
    store.record_usage("a", now=datetime(2024, 5, 2))
    assert store.get("a")["usage_count"] == 1
    store.delete("a")
    assert store.list() == []
    with pytest.raises(KeyError):
        store.delete("a")
    with pytest.raises(KeyError):
        store.record_usage("a")


def test_compile_matches_direct_optimize(store):
    """Round-3 verdict task 5 gate: save → reload → optimize_query output
    identical to optimizing the raw string."""
    raw = 'status = Open AND project = MEM AND updated >= "-7d"'
    store.save("recent", "recent MEM", raw, now=T0)
    assert store.compile("recent") == JQL.optimize_query(raw)


def test_run_executes_and_bumps(store, spark, sf_dir):
    from jira_cdc_git_spark import fixtures as FX
    from jira_cdc_git_spark.operators.jira import _ctx

    store.save("mem-open", "", 'project = MEM AND status != Closed', now=T0)
    iss = FX.issues(spark, sf_dir)
    ctx = _ctx(spark, sf_dir)
    got = store.run(spark, "mem-open", iss, ctx, now=datetime(2024, 5, 2))
    optimized, _ = JQL.optimize_query('project = MEM AND status != Closed')
    want = JQL.run_jql(optimized, iss, ctx)
    assert got.count() == want.count() > 0
    assert got.select("key").exceptAll(want.select("key")).count() == 0
    assert store.get("mem-open")["usage_count"] == 1


def test_as_df_queryable(store, spark):
    store.save("a", "", "project = A", tags=["t1"], now=T0)
    store.save("b", "", "project = B", now=T0)
    store.record_usage("b", now=datetime(2024, 5, 2))
    df = store.as_df(spark)
    assert df.count() == 2
    top = df.orderBy(F.col("usage_count").desc()).first()
    assert top["name"] == "b" and top["usage_count"] == 1


def test_disk_layout_is_reference_shaped(store, tmp_path):
    """JSON array at .jira-sync/saved_queries.json (jira_builder.go:31-33),
    ISO datetimes — the reference's loader would parse this file."""
    store.save("x", "d", "project = X", now=T0)
    path = tmp_path / ".jira-sync" / "saved_queries.json"
    rows = json.loads(path.read_text())
    assert isinstance(rows, list) and rows[0]["name"] == "x"
    assert rows[0]["created_at"] == T0.isoformat()
    assert rows[0]["usage_count"] == 0
