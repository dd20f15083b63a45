"""Tests for YAML edge I/O (S4/S6), job dispatch (S11), profile usage
stats (A8/A9/W8), queue status (A7), JSON edge I/O (F13), backoff (C10)."""

from datetime import datetime

from pyspark.sql import functions as F

from jira_cdc_git_spark import fixtures as FX
from jira_cdc_git_spark import plans
from jira_cdc_git_spark.functions import scalar as SC
from jira_cdc_git_spark.sources import yaml_io
from jira_cdc_git_spark.state import SyncStateStore


def test_yaml_round_trip(spark, sf_dir, tmp_path):
    base = str(tmp_path / "repo")
    issues = FX.issues(spark, sf_dir).limit(40).cache()
    yaml_io.write_yaml_issues(issues, base)
    back = yaml_io.read_yaml_issues(spark, base)
    assert back.count() == issues.count()
    a = {r["key"]: (r["summary"], r["status_name"]) for r in back.collect()}
    b = {
        r["key"]: (r["summary"], r["status"]["name"])
        for r in issues.collect()
    }
    assert a == b
    # F11: key recoverable from path
    k = back.select(SC.key_from_path(F.col("path")).alias("k"), "key")
    assert k.filter(F.col("k") != F.col("key")).count() == 0


def test_yaml_corrupt_file_quarantined(spark, tmp_path):
    import os

    base = str(tmp_path / "repo2")
    p = os.path.join(base, "projects", "X", "issues")
    os.makedirs(p)
    with open(os.path.join(p, "X-1.yaml"), "w") as f:
        f.write("key: X-1\nsummary: ok\nstatus: {name: Done}\n")
    with open(os.path.join(p, "X-2.yaml"), "w") as f:
        f.write("{:::not yaml")
    back = yaml_io.read_yaml_issues(spark, base)
    rows = {r["path"].split("/")[-1]: r["key"] for r in back.collect()}
    assert rows["X-1.yaml"] == "X-1"
    assert rows["X-2.yaml"] is None  # quarantined, not dropped


def test_run_job_jql_and_rejection(spark, sf_dir, tmp_path):
    issues = FX.issues(spark, sf_dir)
    store = SyncStateStore(str(tmp_path / "st"))
    spec = plans.SyncJobSpec(sync_type="jql", jql="project = PROJ")
    res = plans.run_job(
        spark, spec, issues, store, str(tmp_path / "out"), now=datetime(2030, 1, 1)
    )
    n_proj = issues.filter(F.col("project_key") == "PROJ").count()
    assert res["status"] == "completed" and res["total"] == n_proj
    assert store.load(spark).count() == n_proj

    bad = plans.SyncJobSpec(sync_type="jql")  # neither jql nor keys
    res2 = plans.run_job(spark, bad, issues, store, str(tmp_path / "out"))
    assert res2["status"] == "rejected" and res2["errors"]


def test_run_job_dry_run_observes_new_counts(spark, sf_dir, tmp_path):
    issues = FX.issues(spark, sf_dir)
    store = SyncStateStore(str(tmp_path / "st2"))
    spec = plans.SyncJobSpec(
        sync_type="single", issue_keys=["PROJ-0", "PROJ-1"], dry_run=True
    )
    res = plans.run_job(spark, spec, issues, store, str(tmp_path / "out2"))
    assert res["total"] == 2 and res["new"] == 2 and res["processed"] == 0


def test_profile_usage_stats(spark):
    profiles = plans.builtin_profiles(spark)
    assert profiles.count() == 7
    p1 = plans.record_usage(profiles, "epic-sync", 1000, True, datetime(2030, 1, 1))
    p2 = plans.record_usage(p1, "epic-sync", 3000, False, datetime(2030, 1, 2))
    row = p2.filter(F.col("name") == "epic-sync").first()
    assert row["times_used"] == 2
    assert row["avg_sync_time_ms"] == 2000
    assert abs(row["success_rate"] - 0.5) < 1e-9
    top = plans.most_used(p2, 1).first()
    assert top["name"] == "epic-sync"
    by_conc = plans.sort_profiles(p2, "concurrency", desc=True).first()
    assert by_conc["concurrency"] == 8


def test_queue_status_pivot(spark):
    jobs = spark.createDataFrame(
        [("j1", "completed"), ("j2", "completed"), ("j3", "failed"), ("j4", "running")],
        "id string, status string",
    )
    row = plans.queue_status(jobs).first()
    assert row["completed"] == 2 and row["failed"] == 1 and row["running"] == 1
    assert row["pending"] is None


def test_json_round_trip(spark, sf_dir):
    st = FX.sync_state(spark, sf_dir).limit(20)
    js = st.select(SC.row_to_json(*st.columns).alias("j"))
    schema = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in st.schema)
    back = js.select(SC.json_to_row(F.col("j"), schema).alias("r")).select("r.*")
    assert back.count() == 20
    assert sorted(back.columns) == sorted(st.columns)
    a = sorted(st.collect(), key=lambda r: r["key"])
    b = sorted(back.collect(), key=lambda r: r["key"])
    assert a == b


def test_backoff_curve(spark):
    df = spark.range(1, 8).select(
        F.col("id").alias("attempt"), SC.backoff_ms(F.col("id")).alias("ms")
    )
    got = {r["attempt"]: r["ms"] for r in df.collect()}
    assert got == {1: 1000, 2: 2000, 3: 4000, 4: 8000, 5: 16000, 6: 30000, 7: 30000}


def test_duration_parse(spark):
    df = spark.createDataFrame(
        [("500ms",), ("2s",), ("3m",), ("1h",), ("oops",)], "d string"
    ).select("d", SC.duration_ms(F.col("d")).alias("ms"))
    got = {r["d"]: r["ms"] for r in df.collect()}
    assert got == {"500ms": 500, "2s": 2000, "3m": 180000, "1h": 3600000, "oops": None}
