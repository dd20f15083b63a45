"""Event-time operators over the `events` table (SURVEY §2.8 extension
surface: tumbling/sliding/session windows, as-of joins).

The reference has no event-time windowing (its CDC is polling incremental
sync); these are the extension operators the north star requires, written
so the batch formulation is oracle-checkable and the streaming formulation
(streaming/pipeline.py) shares the same aggregation expressions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from jira_cdc_git_spark.sources.registry import load_table


def tumbling_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour event-time window aggregation (batch equivalent of
    `groupBy(window(ts, '1 hour'))`). date_trunc keeps the key a plain
    timestamp so the DuckDB oracle compares directly. One shuffle on
    (hour, type); partial agg runs map-side."""
    ev = load_table(spark, "events", sf_dir)
    return (
        ev.groupBy(
            F.date_trunc("hour", F.col("ts")).alias("hour_ts"),
            F.col("event_type"),
        )
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
    )


def sliding_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding window (1 hour, sliding 30 min) via F.window — each event
    lands in 2 windows. Output window start as timestamp."""
    ev = load_table(spark, "events", sf_dir)
    return (
        ev.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"), "event_type")
        .agg(F.count("*").alias("n"))
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n",
        )
    )


def sessionize(spark: SparkSession, sf_dir: str, gap_minutes: int = 30) -> DataFrame:
    """Sessionization: split each user's event stream on inactivity gaps
    > gap_minutes (batch analog of `session_window`; SURVEY §2.8 note).
    lag + cumulative-sum-of-gap-flags — two window passes over one
    user-key shuffle. At 100 TB: partition by user bucket; per-user data
    fits easily (sessions are short)."""
    ev = load_table(spark, "events", sf_dir)
    by_user = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.col("ts").cast("long") - F.lag(F.col("ts").cast("long")).over(by_user)
    flagged = ev.withColumn(
        "new_session",
        F.when(gap.isNull() | (gap > gap_minutes * 60), 1).otherwise(0),
    )
    with_sid = flagged.withColumn(
        "session_seq",
        F.sum("new_session").over(
            by_user.rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    return (
        with_sid.groupBy("user_id", "session_seq")
        .agg(
            F.count("*").alias("n_events"),
            (F.max(F.col("ts").cast("long")) - F.min(F.col("ts").cast("long"))).alias(
                "duration_sec"
            ),
            F.round(F.sum("value"), 2).alias("session_value"),
        )
    )


def asof_last_error_before_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: for every purchase event, the most recent error event of
    the same user at-or-before it (Spark lacks a native as-of join — SURVEY
    §2.9 / guide pattern). Composition strategy: tag the union, carry the
    last non-null error timestamp forward with an unbounded-preceding
    window, keep purchases. ONE shuffle on user_id — strictly better at
    scale than a range self-join, and no driver-side loop."""
    ev = load_table(spark, "events", sf_dir)
    sub = ev.filter(F.col("event_type").isin("purchase", "error"))
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = sub.withColumn(
        "last_error_ts",
        F.last(
            F.when(F.col("event_type") == "error", F.col("ts")), ignorenulls=True
        ).over(w),
    )
    return carried.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "last_error_ts"
    )
