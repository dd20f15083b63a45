"""C9 schedule semantics — concurrencyPolicy (Allow/Forbid/Replace),
startingDeadlineSeconds, suspend and history limits around job runs
(reference: crds/v1alpha1/syncschedule-crd.yaml:44-110 — spec-only in the
reference, no Go controller implements it; here the semantics are real).

Spark-first split: the cron TICK comes from outside (external cron /
Airflow / `Trigger.AvailableNow` kicks — SURVEY §2.8 C9 posture); this
module supplies what the tick needs to be SAFE: a per-schedule run lock
with the three concurrency policies, a JSONL run journal the A7
queue-status query reads, and deadline/suspend gates. Locks are O_EXCL
files (one per active run) — the driver-side config edge, never a data-path
bottleneck.

Replace-cancellation plugs into Spark job groups: each run executes under
``setJobGroup(run_id)`` and a Replace acquisition calls
``cancelJobGroup(old_run_id)`` so the superseded run's stages actually
stop.
"""

from __future__ import annotations

import json
import os
from collections.abc import Callable
from datetime import datetime

from pyspark.sql import DataFrame, SparkSession

POLICIES = ("Allow", "Forbid", "Replace")  # CRD enum, default Forbid


class ScheduleLock:
    """Per-schedule active-run registry + append-only run journal."""

    def __init__(self, root: str):
        self.root = root
        self.locks = os.path.join(root, "locks")
        self.journal = os.path.join(root, "runs.jsonl")
        os.makedirs(self.locks, exist_ok=True)

    # -- journal -----------------------------------------------------------

    def _record(self, schedule: str, run_id: str, event: str,
                at: datetime, **extra) -> None:
        row = {"schedule": schedule, "run_id": run_id, "event": event,
               "at": at.isoformat(), **extra}
        with open(self.journal, "a") as f:
            f.write(json.dumps(row, sort_keys=True) + "\n")

    def journal_df(self, spark: SparkSession) -> DataFrame:
        if not os.path.isfile(self.journal):
            return spark.createDataFrame(
                [], "schedule string, run_id string, event string, at string"
            )
        return spark.read.json(self.journal)

    # -- active-run bookkeeping ---------------------------------------------

    def _sched_dir(self, schedule: str) -> str:
        d = os.path.join(self.locks, schedule)
        os.makedirs(d, exist_ok=True)
        return d

    def active(self, schedule: str) -> list[str]:
        return sorted(
            n[:-7]
            for n in os.listdir(self._sched_dir(schedule))
            if n.endswith(".active")
        )

    def _mark_active(self, schedule: str, run_id: str) -> None:
        path = os.path.join(self._sched_dir(schedule), f"{run_id}.active")
        fd = os.open(path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        os.close(fd)

    def _clear_active(self, schedule: str, run_id: str) -> None:
        try:
            os.unlink(
                os.path.join(self._sched_dir(schedule), f"{run_id}.active")
            )
        except FileNotFoundError:
            pass

    # -- the policy gate -----------------------------------------------------

    def acquire(
        self,
        schedule: str,
        run_id: str,
        policy: str = "Forbid",
        now: datetime | None = None,
        cancel: Callable[[str], None] | None = None,
        fire_time: datetime | None = None,
        starting_deadline_s: int | None = None,
        suspend: bool = False,
    ) -> tuple[str, list[str]]:
        """Gate one tick. Returns (action, replaced_run_ids) where action ∈
        {started, skipped_forbid, skipped_suspended, skipped_deadline}.

        Forbid: an overlapping tick is skipped and journaled (CRD default).
        Replace: active runs are cancelled (``cancel(run_id)`` — wired to
        cancelJobGroup), journaled as replaced, then this run starts.
        Allow: concurrent runs coexist, each tracked.
        """
        now = now or datetime.now()
        if policy not in POLICIES:
            raise ValueError(f"unknown concurrencyPolicy {policy!r}")
        if suspend:
            self._record(schedule, run_id, "skipped_suspended", now)
            return "skipped_suspended", []
        if (
            starting_deadline_s is not None
            and fire_time is not None
            and (now - fire_time).total_seconds() > starting_deadline_s
        ):
            self._record(schedule, run_id, "skipped_deadline", now,
                         fire_time=fire_time.isoformat())
            return "skipped_deadline", []
        running = self.active(schedule)
        if running and policy == "Forbid":
            self._record(schedule, run_id, "skipped_forbid", now,
                         blocking=running)
            return "skipped_forbid", []
        replaced: list[str] = []
        if running and policy == "Replace":
            for old in running:
                if cancel is not None:
                    cancel(old)
                self._clear_active(schedule, old)
                self._record(schedule, old, "replaced", now,
                             replaced_by=run_id)
                replaced.append(old)
        self._mark_active(schedule, run_id)
        self._record(schedule, run_id, "started", now)
        return "started", replaced

    def release(self, schedule: str, run_id: str, status: str,
                now: datetime | None = None) -> None:
        self._clear_active(schedule, run_id)
        self._record(schedule, run_id, status, now or datetime.now())

    # -- history limits (successful/failedJobsHistoryLimit) ------------------

    def prune_history(self, keep_success: int = 3, keep_failed: int = 1) -> None:
        """Rewrite the journal keeping the most recent N completed and M
        failed runs per schedule (CRD history limits; started/skip events
        for retained runs are kept)."""
        if not os.path.isfile(self.journal):
            return
        with open(self.journal) as f:
            rows = [json.loads(line) for line in f if line.strip()]
        keep_runs: set[tuple[str, str]] = set()
        by_sched: dict[str, dict[str, list[dict]]] = {}
        for r in rows:
            by_sched.setdefault(r["schedule"], {}).setdefault(
                r["event"], []
            ).append(r)
        for sched, events in by_sched.items():
            for ev, cap in (("completed", keep_success), ("failed", keep_failed)):
                tail = sorted(events.get(ev, []), key=lambda r: r["at"])[-cap:]
                keep_runs.update((sched, r["run_id"]) for r in tail)
            # never prune live or non-terminal bookkeeping of active runs
            for ev in ("started", "skipped_forbid", "skipped_suspended",
                       "skipped_deadline", "replaced"):
                keep_runs.update(
                    (sched, r["run_id"]) for r in events.get(ev, [])
                    if (sched, r["run_id"]) not in keep_runs
                    and ev != "started"
                )
            started = {r["run_id"] for r in events.get("started", [])}
            done = {r["run_id"] for ev in ("completed", "failed", "canceled")
                    for r in events.get(ev, [])}
            keep_runs.update((sched, rid) for rid in started - done)
        kept = [r for r in rows
                if (r["schedule"], r["run_id"]) in keep_runs]
        tmp = self.journal + ".tmp"
        with open(tmp, "w") as f:
            for r in kept:
                f.write(json.dumps(r, sort_keys=True) + "\n")
        os.replace(tmp, self.journal)


def run_scheduled(
    spark: SparkSession,
    lock: ScheduleLock,
    schedule: str,
    run_id: str,
    run_fn: Callable[[], dict],
    policy: str = "Forbid",
    now: datetime | None = None,
    **gate_kwargs,
) -> dict:
    """One schedule tick around an arbitrary job body (e.g. plans.run_job):
    policy gate → job group → run → release. Replace cancellations abort
    the superseded run's Spark stages via its job group."""
    action, replaced = lock.acquire(
        schedule,
        run_id,
        policy,
        now=now,
        cancel=lambda old: spark.sparkContext.cancelJobGroup(old),
        **gate_kwargs,
    )
    if action != "started":
        return {"status": action, "replaced": replaced}
    spark.sparkContext.setJobGroup(run_id, f"schedule:{schedule}",
                                   interruptOnCancel=True)
    try:
        result = run_fn()
    except Exception:
        lock.release(schedule, run_id, "failed", now)
        raise
    finally:
        spark.sparkContext.setJobGroup("", "")
    lock.release(schedule, run_id, "completed", now)
    return {"status": "completed", "replaced": replaced, **result}


# ---------------------------------------------------------------------------
# Round-6: thin observability parity — the reference exposes reconcile
# counters/durations and job-phase gauges over Prometheus
# (internal/operator/controllers/jirasync_controller.go:100-181); the
# Spark-first analog is a queryable METRICS FRAME over the artifacts the
# engine already journals (the schedule run journal + the job queue),
# so the same rollups run as plain DataFrame queries.
# ---------------------------------------------------------------------------

def metrics_rollup_frame(ops: DataFrame) -> DataFrame:
    """jirasync_reconcile_total / _duration_seconds as ONE rollup over an
    operations journal with (op_type, status, duration_ms): run counts
    per (name, result) label pair, total/exact-p95 duration, and the
    mean in seconds — the table a Grafana panel would chart from the
    reference's histogram.

    100 TB shape: one partial-agg shuffle keyed by (op_type, status);
    the journal itself is control-plane-sized (ops, not rows)."""
    from pyspark.sql import functions as F

    from jira_cdc_git_spark.functions import text as TX

    return ops.groupBy("op_type", "status").agg(
        F.count("*").alias("n_runs"),
        F.sum("duration_ms").cast("long").alias("total_duration_ms"),
        TX.round_half_up(F.avg(F.col("duration_ms") / 1000.0), 4).alias(
            "avg_duration_s"
        ),
        TX.round_half_up(
            F.percentile(F.col("duration_ms").cast("double"), F.lit(0.95)), 4
        ).alias("p95_duration_ms"),
    )


def metrics_frame(
    spark: SparkSession,
    lock: "ScheduleLock | None" = None,
    jobs: DataFrame | None = None,
) -> DataFrame:
    """The live metrics table: long-format (metric, name, result, value)
    series folded from the schedule run journal (reconcile counters)
    and the job queue (phase gauges) — the /metrics endpoint's content
    as a DataFrame."""
    from pyspark.sql import functions as F

    parts = []
    if lock is not None:
        j = lock.journal_df(spark)
        if "event" in j.columns and j.head(1):
            parts.append(
                j.groupBy(
                    F.lit("sync_reconcile_total").alias("metric"),
                    F.col("schedule").alias("name"),
                    F.col("event").alias("result"),
                ).agg(F.count("*").cast("double").alias("value"))
            )
    if jobs is not None:
        parts.append(
            jobs.groupBy(
                F.lit("sync_jobs_total").alias("metric"),
                F.col("type").alias("name"),
                F.col("status").alias("result"),
            ).agg(F.count("*").cast("double").alias("value"))
        )
    if not parts:
        return spark.createDataFrame(
            [], "metric string, name string, result string, value double"
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out
