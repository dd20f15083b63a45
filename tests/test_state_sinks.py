"""Round-trip tests for the CDC state layer, sinks and the shared
incremental-sync batch body (C1-C8, S6-S10)."""

from datetime import datetime, timedelta

import pytest
from pyspark.sql import functions as F

from jira_cdc_git_spark import fixtures as FX
from jira_cdc_git_spark import sinks
from jira_cdc_git_spark.state import HISTORY_CAP, SyncStateStore
from jira_cdc_git_spark.streaming.pipeline import incremental_sync_batch

T0 = datetime(2002, 1, 1)


@pytest.fixture
def store(tmp_path):
    return SyncStateStore(str(tmp_path / "state"))


@pytest.fixture(scope="module")
def issues(spark, sf_dir):
    df = FX.issues(spark, sf_dir).limit(200).cache()
    df.count()
    return df


def test_empty_store_loads_empty(store, spark):
    assert store.load(spark).count() == 0
    assert store.current_version() == 0


def test_merge_then_all_synced(store, spark, issues):
    store.merge(spark, issues, T0)
    st = store.load(spark)
    assert st.count() == issues.count()
    assert st.filter(F.col("sync_count") != 1).count() == 0
    # idempotent re-merge: same keys, sync_count bumps, no dup rows
    store.merge(spark, issues, T0 + timedelta(hours=1))
    st2 = store.load(spark)
    assert st2.count() == issues.count()
    assert st2.filter(F.col("sync_count") != 2).count() == 0


def test_filter_changes_new_vs_updated(store, spark, issues):
    half = issues.filter(F.col("key").rlike("[02468]$"))
    store.merge(spark, half, T0 + timedelta(days=365 * 10))  # far-future watermark
    changes = store.filter_changes(spark, issues)
    got = {r["change_type"] for r in changes.select("change_type").distinct().collect()}
    assert got == {"new"}  # synced half is up to date, rest is new
    assert changes.count() == issues.count() - half.count()
    # force resyncs everything
    assert store.filter_changes(spark, issues, force=True).count() == issues.count()


def test_incremental_second_run_syncs_only_updates(store, spark, issues, tmp_path):
    out = str(tmp_path / "out")
    r1 = incremental_sync_batch(spark, issues, store, out, now=datetime(2030, 1, 1))
    assert r1["total"] == issues.count()
    # second run, nothing changed → zero candidates
    r2 = incremental_sync_batch(spark, issues, store, out, now=datetime(2030, 1, 2))
    assert r2["total"] == 0
    # touch 10 issues → only those resync
    touched = issues.withColumn(
        "updated",
        F.when(F.col("key").rlike("0$"), F.lit(datetime(2031, 1, 1))).otherwise(
            F.col("updated")
        ),
    )
    n_touched = touched.filter(F.col("key").rlike("0$")).count()
    r3 = incremental_sync_batch(spark, touched, store, out, now=datetime(2031, 1, 2))
    assert r3["total"] == n_touched
    # delta log holds initial snapshot + the touched rows; latest-wins view
    # collapses back to one row per key with the new timestamps winning
    raw = spark.read.parquet(f"{out}/issues")
    assert raw.count() == issues.count() + n_touched
    latest = sinks.latest_issues(spark, f"{out}/issues")
    assert latest.count() == issues.count()
    assert latest.filter(F.col("updated") == datetime(2031, 1, 1)).count() == n_touched
    log = spark.read.parquet(f"{out}/commit_log")
    # commit ids deterministic: one per (key, updated) version
    assert log.select("commit_id").distinct().count() == issues.count() + n_touched
    # compaction rewrites the log to the latest snapshot
    sinks.compact_issues(spark, f"{out}/issues")
    assert spark.read.parquet(f"{out}/issues").count() == issues.count()


def test_dry_run_writes_nothing(store, spark, issues, tmp_path):
    out = str(tmp_path / "out2")
    r = incremental_sync_batch(
        spark, issues, store, out, now=T0, dry_run=True
    )
    assert r["total"] == issues.count() and r["processed"] == 0
    assert store.load(spark).count() == 0
    import os

    assert not os.path.exists(f"{out}/issues")


def test_history_cap_and_watermark(store, spark):
    for i in range(HISTORY_CAP + 10):
        start = T0 + timedelta(minutes=i)
        store.record_operation(
            spark, "incremental", "completed" if i % 2 == 0 else "failed",
            start, start + timedelta(seconds=30),
        )
    hist = store.history(spark)
    assert hist.count() == HISTORY_CAP
    # W5: last completed end time
    last = store.last_sync_time(spark)
    expected_last_completed = T0 + timedelta(minutes=HISTORY_CAP + 8, seconds=30)
    assert last == expected_last_completed


def test_backup_restore_time_travel(store, spark, issues):
    v1 = store.merge(spark, issues.limit(50), T0)
    v2 = store.merge(spark, issues, T0 + timedelta(hours=1))
    assert store.load(spark).count() == issues.count()
    store.restore(v1)
    assert store.load(spark).count() == 50
    store.restore(v2)
    assert store.current_version() == v2
    with pytest.raises(FileNotFoundError):
        store.restore(99)


def test_validate_and_repair(store, spark, issues):
    store.merge(spark, issues, T0)
    st = store.load(spark)
    # simulate disk: drop 5 files, corrupt 3 checksums, add 2 orphans
    files = st.select(
        F.col("file_path").alias("path"),
        F.col("file_size").alias("size"),
        F.col("checksum").alias("sha256"),
    )
    keys = [r["path"] for r in files.limit(10).collect()]
    gone, bad = keys[:5], keys[5:8]
    files_sim = (
        files.filter(~F.col("path").isin(gone))
        .withColumn(
            "sha256",
            F.when(F.col("path").isin(bad), F.lit("feedface")).otherwise(
                F.col("sha256")
            ),
        )
        .unionByName(
            spark.createDataFrame(
                [("projects/X/issues/ORPHAN-1.yaml", 1, "aa"),
                 ("projects/X/issues/ORPHAN-2.yaml", 1, "bb")],
                "path string, size long, sha256 string",
            )
        )
    )
    report = store.validate(spark, files_sim)
    by_problem = {
        r["problem"]: r["n"]
        for r in report.groupBy("problem").agg(F.count("*").alias("n")).collect()
    }
    assert by_problem == {"orphaned": 2, "missing": 5, "drift": 3}
    # repair drops missing entries; orphans untouched
    store.repair(spark, files_sim)
    assert store.load(spark).count() == issues.count() - 5


def test_partitioned_issue_write_prunes(spark, issues, tmp_path):
    out = str(tmp_path / "issues_part")
    sinks.write_issues(issues, out)
    back = spark.read.parquet(out)
    assert back.count() == issues.count()
    one = back.filter(F.col("project_key") == "PROJ")
    plan = one._jdf.queryExecution().executedPlan().toString()
    assert "PROJ" in plan  # partition filter present
    import os

    assert any(d.startswith("project_key=") for d in os.listdir(out))


def test_edge_sink_layout(spark, sf_dir, tmp_path):
    from jira_cdc_git_spark.operators.jira import link_edges

    out = str(tmp_path / "edges")
    edges = link_edges(spark, sf_dir)
    sinks.write_edges(edges, out)
    back = spark.read.parquet(out)
    assert back.count() == edges.count()
    import os

    assert any(d.startswith("link_type=") for d in os.listdir(out))


def test_merge_rewrites_only_touched_partitions(store, spark, issues):
    import os

    # v1: all projects
    v1 = store.merge(spark, issues, T0)
    projects = {
        r["project_key"]
        for r in issues.select("project_key").distinct().collect()
    }
    assert len(projects) > 1
    # v2: a batch touching ONLY one project
    one = sorted(projects)[0]
    batch = issues.filter(F.col("project_key") == one).withColumn(
        "updated", F.lit(T0 + timedelta(days=1))
    )
    v2 = store.merge(spark, batch, T0 + timedelta(days=2))

    def part_files(v, proj):
        d = os.path.join(store._version_path(v), f"project_key={proj}")
        return {
            f: os.stat(os.path.join(d, f)).st_ino
            for f in os.listdir(d)
            if f.endswith(".parquet")
        }

    # touched partition: physically rewritten (new inodes)
    assert set(part_files(v1, one).values()).isdisjoint(
        set(part_files(v2, one).values())
    )
    # every untouched partition: identical inodes (hard links, zero copy)
    for p in projects - {one}:
        assert part_files(v1, p) == part_files(v2, p), p
    # semantics unchanged: all rows present, touched project bumped
    st = store.load(spark)
    assert st.count() == issues.count()
    assert (
        st.filter(F.col("project_key") == one)
        .filter(F.col("sync_count") != 2)
        .count()
        == 0
    )
    assert (
        st.filter(F.col("project_key") != one)
        .filter(F.col("sync_count") != 1)
        .count()
        == 0
    )
    # time travel still works across the linked version
    store.restore(v1)
    assert store.load(spark).filter(F.col("sync_count") != 1).count() == 0
    store.restore(v2)


def test_corpus_shard_sink_roundtrip(spark, sf_dir, tmp_path):
    import os

    from jira_cdc_git_spark import sinks as S
    from jira_cdc_git_spark.operators.text import corpus_shards

    path = str(tmp_path / "corpus")
    S.write_corpus_shards(spark, sf_dir, path, n_shards=4)
    # partition layout: one directory per shard
    dirs = sorted(d for d in os.listdir(path) if d.startswith("shard="))
    assert dirs == [f"shard={i}" for i in range(4)]
    # read-back of one shard is exactly the assignment's pos order
    assignment = {
        (r["doc_id"]): (r["shard"], r["pos"])
        for r in corpus_shards(spark, sf_dir, n_shards=4).collect()
    }
    got = S.read_corpus_shard(spark, path, 2).select("doc_id", "pos").collect()
    assert len(got) > 0
    assert [r["pos"] for r in got] == sorted(r["pos"] for r in got)
    for r in got:
        assert assignment[r["doc_id"]] == (2, r["pos"])
    # full union covers every document exactly once
    total = spark.read.parquet(path).count()
    assert total == len(assignment)
