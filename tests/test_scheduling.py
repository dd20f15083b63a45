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
