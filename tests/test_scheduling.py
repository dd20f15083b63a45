"""C9 concurrencyPolicy tests (syncschedule-crd.yaml:44-110 semantics:
Allow/Forbid/Replace, startingDeadlineSeconds, suspend, history limits)."""

from datetime import datetime, timedelta

import pytest

from jira_cdc_git_spark.scheduling import ScheduleLock, run_scheduled

T0 = datetime(2026, 3, 1, 9, 0, 0)


@pytest.fixture
def lock(tmp_path):
    return ScheduleLock(str(tmp_path / "sched"))


def test_forbid_skips_overlap_and_records(lock):
    a, _ = lock.acquire("nightly", "run-1", "Forbid", now=T0)
    assert a == "started"
    a2, _ = lock.acquire("nightly", "run-2", "Forbid", now=T0)
    assert a2 == "skipped_forbid"
    assert lock.active("nightly") == ["run-1"]
    lock.release("nightly", "run-1", "completed", T0)
    # after release the next tick runs
    a3, _ = lock.acquire("nightly", "run-3", "Forbid", now=T0)
    assert a3 == "started"


def test_replace_cancels_and_reruns(lock):
    cancelled = []
    lock.acquire("nightly", "run-1", "Replace", now=T0)
    a, replaced = lock.acquire(
        "nightly", "run-2", "Replace", now=T0, cancel=cancelled.append
    )
    assert a == "started"
    assert replaced == ["run-1"] and cancelled == ["run-1"]
    assert lock.active("nightly") == ["run-2"]


def test_allow_runs_concurrently(lock):
    lock.acquire("nightly", "run-1", "Allow", now=T0)
    a, replaced = lock.acquire("nightly", "run-2", "Allow", now=T0)
    assert a == "started" and replaced == []
    assert lock.active("nightly") == ["run-1", "run-2"]


def test_deadline_and_suspend_gates(lock):
    a, _ = lock.acquire(
        "nightly", "run-1", "Forbid", now=T0,
        fire_time=T0 - timedelta(seconds=120), starting_deadline_s=60,
    )
    assert a == "skipped_deadline"
    a2, _ = lock.acquire(
        "nightly", "run-2", "Forbid", now=T0,
        fire_time=T0 - timedelta(seconds=30), starting_deadline_s=60,
    )
    assert a2 == "started"
    lock.release("nightly", "run-2", "completed", T0)
    a3, _ = lock.acquire("nightly", "run-3", "Forbid", now=T0, suspend=True)
    assert a3 == "skipped_suspended"


def test_journal_feeds_queue_status(lock, spark):
    lock.acquire("nightly", "run-1", "Forbid", now=T0)
    lock.acquire("nightly", "run-2", "Forbid", now=T0)  # skipped
    lock.release("nightly", "run-1", "completed", T0)
    df = lock.journal_df(spark)
    events = {
        (r["run_id"], r["event"]) for r in df.collect()
    }
    assert events == {
        ("run-1", "started"), ("run-2", "skipped_forbid"),
        ("run-1", "completed"),
    }


def test_history_limits_prune(lock, spark):
    for i in range(6):
        rid = f"ok-{i}"
        lock.acquire("s", rid, "Forbid", now=T0 + timedelta(minutes=i))
        lock.release("s", rid, "completed", T0 + timedelta(minutes=i))
    for i in range(3):
        rid = f"bad-{i}"
        lock.acquire("s", rid, "Forbid", now=T0 + timedelta(hours=1, minutes=i))
        lock.release("s", rid, "failed", T0 + timedelta(hours=1, minutes=i))
    lock.prune_history(keep_success=3, keep_failed=1)
    df = lock.journal_df(spark)
    done = sorted(
        r["run_id"] for r in df.collect() if r["event"] == "completed"
    )
    failed = sorted(
        r["run_id"] for r in df.collect() if r["event"] == "failed"
    )
    assert done == ["ok-3", "ok-4", "ok-5"]
    assert failed == ["bad-2"]


def test_run_scheduled_end_to_end(lock, spark):
    calls = []

    def body():
        calls.append(1)
        return {"n": spark.range(10).count()}

    r = run_scheduled(spark, lock, "nightly", "run-1", body, "Forbid", now=T0)
    assert r["status"] == "completed" and r["n"] == 10 and calls == [1]
    assert lock.active("nightly") == []
    # a failing body releases as failed and re-raises
    def boom():
        raise RuntimeError("x")

    with pytest.raises(RuntimeError):
        run_scheduled(spark, lock, "nightly", "run-2", boom, "Forbid", now=T0)
    assert lock.active("nightly") == []
    events = {(r["run_id"], r["event"]) for r in lock.journal_df(spark).collect()}
    assert ("run-2", "failed") in events


def test_metrics_frame_folds_journal_and_jobs(lock, spark):
    """Round-6 observability parity: the live metrics table folds the
    schedule run journal (reconcile counters) and the job queue (phase
    gauges) into long-format series — the queryable analog of
    jirasync_controller.go:100-181's Prometheus registry."""
    from jira_cdc_git_spark.scheduling import metrics_frame, metrics_rollup_frame

    now = datetime(2024, 1, 1)
    lock.acquire("nightly", "r1", "Forbid", now=now)
    lock.release("nightly", "r1", "completed", now)
    lock.acquire("nightly", "r2", "Forbid", now=now)
    lock.acquire("nightly", "r3", "Forbid", now=now)  # skipped_forbid
    jobs = spark.createDataFrame(
        [("j-1", "jql", "completed"), ("j-2", "jql", "failed"),
         ("j-3", "batch", "pending")],
        "job_id string, type string, status string",
    )
    m = {(r["metric"], r["name"], r["result"]): r["value"]
         for r in metrics_frame(spark, lock=lock, jobs=jobs).collect()}
    assert m[("sync_reconcile_total", "nightly", "completed")] == 1.0
    assert m[("sync_reconcile_total", "nightly", "skipped_forbid")] == 1.0
    assert m[("sync_jobs_total", "jql", "failed")] == 1.0
    assert m[("sync_jobs_total", "batch", "pending")] == 1.0

    # the rollup arm: exact p95 + mean over a known journal
    ops = spark.createDataFrame(
        [("a", "full_sync", "success", 1000), ("b", "full_sync", "success", 3000),
         ("c", "full_sync", "failed", 10000)],
        "op_id string, op_type string, status string, duration_ms long",
    )
    rows = {(r["op_type"], r["status"]): r
            for r in metrics_rollup_frame(ops).collect()}
    ok = rows[("full_sync", "success")]
    assert (ok["n_runs"], ok["total_duration_ms"]) == (2, 4000)
    assert ok["avg_duration_s"] == 2.0
    assert ok["p95_duration_ms"] == 2900.0  # interpolated 0.95 between 1000,3000
    assert rows[("full_sync", "failed")]["n_runs"] == 1
