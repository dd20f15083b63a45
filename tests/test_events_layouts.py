"""The events `ts` column ships in three parquet layouts in the wild;
sources.registry._load_events must read all of them to the same zoned
TIMESTAMP(MICROS) values:

  * INT64 logical TIMESTAMP(MICROS)  — reads natively (the testdata form)
  * INT96 (legacy Spark zoned write) — pyarrow calls it timestamp[ns],
    but it reads natively in Spark; the nanos sniff must NOT fire
    (physical-type check — r4 regression: our own round-tripped files
    were INT96 and took the wrong branch)
  * INT64 logical TIMESTAMP(NANOS)   — Spark 4 rejects outright without
    the nanosAsLong flag; the sniff must fire and truncate ns → µs
"""

from __future__ import annotations

import datetime
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from jira_cdc_git_spark.sources.registry import _events_ts_is_nanos, load_table

TS = [
    datetime.datetime(2024, 3, 1, 12, 0, 0, 123456),
    datetime.datetime(2024, 3, 2, 13, 30, 5, 654321),
]


def _expected(spark):
    return {r["event_id"]: r["ts"] for r in _micros_df(spark).collect()}


def _micros_df(spark):
    return spark.createDataFrame(
        [(i, t, i * 10, "view", 1.0, "{}") for i, t in enumerate(TS)],
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )


def _write_sf(tmp_path, name, writer):
    d = tmp_path / name
    os.makedirs(d, exist_ok=True)
    writer(str(d / "events.parquet"))
    return str(d)


def test_micros_int64_reads_natively(spark, tmp_path):
    sf = _write_sf(
        tmp_path,
        "us",
        lambda p: _micros_df(spark).write.parquet(p),
    )
    assert not _events_ts_is_nanos(f"{sf}/events.parquet")
    got = {r["event_id"]: r["ts"] for r in load_table(spark, "events", sf).collect()}
    assert got == _expected(spark)


def test_legacy_int96_not_mistaken_for_nanos(spark, tmp_path):
    def w(p):
        spark.conf.set("spark.sql.parquet.outputTimestampType", "INT96")
        try:
            _micros_df(spark).write.parquet(p)
        finally:
            spark.conf.set(
                "spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS"
            )

    sf = _write_sf(tmp_path, "int96", w)
    part = next(
        f
        for f in os.listdir(f"{sf}/events.parquet")
        if f.endswith(".parquet")
    )
    assert (
        pq.ParquetFile(f"{sf}/events.parquet/{part}").schema.column(1).physical_type
        == "INT96"
    )
    # pyarrow reports INT96 as ns — the sniff must still say "not nanos"
    assert not _events_ts_is_nanos(f"{sf}/events.parquet")
    got = {r["event_id"]: r["ts"] for r in load_table(spark, "events", sf).collect()}
    assert got == _expected(spark)


def test_true_nanos_truncates_to_micros(spark, tmp_path):
    def w(p):
        tbl = pa.table(
            {
                "event_id": pa.array([0, 1], pa.int64()),
                "ts": pa.array(TS, pa.timestamp("ns")),
                "user_id": pa.array([0, 10], pa.int64()),
                "event_type": pa.array(["view", "view"]),
                "value": pa.array([1.0, 1.0]),
                "props": pa.array(["{}", "{}"]),
            }
        )
        pq.write_table(tbl, p, store_schema=False)

    sf = _write_sf(tmp_path, "ns", w)
    assert _events_ts_is_nanos(f"{sf}/events.parquet")
    # sanity: a raw read of this layout is the crash load_table guards
    with pytest.raises(Exception):
        spark.read.parquet(f"{sf}/events.parquet").collect()
    got = {r["event_id"]: r["ts"] for r in load_table(spark, "events", sf).collect()}
    assert got == _expected(spark)


def test_session_writes_micros_by_default(spark, tmp_path):
    out = str(tmp_path / "roundtrip")
    _micros_df(spark).write.parquet(out)
    part = next(f for f in os.listdir(out) if f.endswith(".parquet"))
    assert (
        pq.ParquetFile(os.path.join(out, part)).schema.column(1).physical_type
        == "INT64"
    )
