"""Testdata table registry.

The driver's synthetic tables (TESTDATA.md): a TPC-H-ish star schema plus
`events` (stream-shaped), `documents` (text corpus), and `embeddings`
(vector corpus). One parquet file per table under /root/testdata/sf*/.

At 100 TB these would be partitioned/bucketed tables; a plain
`spark.read.parquet` on a directory of files scales the same way — Spark
splits by `spark.sql.files.maxPartitionBytes`, and filters/projections push
down to the parquet scan (verify with .explain: PushedFilters / ReadSchema).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, name: str, sf_dir: str = DEFAULT_SF_DIR) -> DataFrame:
    if name == "events":
        return _load_events(spark, sf_dir)
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def _load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events.parquet has shipped `ts` as either parquet TIMESTAMP(MICROS)
    (reads natively) or TIMESTAMP(NANOS), which Spark 4 rejects outright
    (PARQUET_TYPE_ILLEGAL). Handle both: sniff the footer schema cheaply
    via pyarrow; on the NANOS layout read `ts` as a long of nanoseconds
    (runtime SQLConf) and truncate to microseconds — exactly what DuckDB
    does when it coerces NANOS to its native µs timestamps, so oracle
    comparisons line up bit-for-bit.

    `ts div 1000` is integer division on the JVM side: no double round-trip,
    no precision loss at 1.7e18-nanosecond magnitudes.
    """
    path = os.path.join(sf_dir, "events.parquet")
    if not _events_ts_is_nanos(path):
        raw = spark.read.parquet(path)
        # parquet µs-without-timezone arrives as TIMESTAMP_NTZ; normalize to
        # the session type every operator and oracle was validated against.
        # Session tz is pinned to UTC (session.py) so the cast is value-exact.
        if dict(raw.dtypes).get("ts") == "timestamp_ntz":
            raw = raw.withColumn("ts", F.col("ts").cast("timestamp"))
        return raw
    key = "spark.sql.legacy.parquet.nanosAsLong"
    prev = spark.conf.get(key, None)
    spark.conf.set(key, "true")
    try:
        raw = spark.read.parquet(path)
        # force schema resolution while the flag is live; the runtime read
        # path re-resolves from this analyzed plan, not from the conf
        raw.schema
    finally:
        # restore so an unrelated later read of real NANOS parquet in the
        # same session still fails loudly instead of silently widening
        if prev is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prev)
    return raw.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))


def _events_ts_is_nanos(path: str) -> bool:
    """Footer-only sniff of the `ts` physical unit (no data read; on object
    storage this is one ranged GET of the footer, same as Spark's own
    schema discovery)."""
    try:
        import pyarrow.parquet as pq

        target = path
        if os.path.isdir(path):
            parts = [f for f in sorted(os.listdir(path)) if f.endswith(".parquet")]
            if not parts:
                return False
            target = os.path.join(path, parts[0])
        field = pq.read_schema(target).field("ts")
        if getattr(field.type, "unit", None) != "ns":
            return False
        # pyarrow reports legacy INT96 timestamps as timestamp[ns] too,
        # but INT96 reads natively in Spark (it is NOT the
        # TIMESTAMP(NANOS) INT64 layout the nanosAsLong branch handles):
        # require physical INT64 before taking the nanos path.
        pf = pq.ParquetFile(target)
        idx = pf.schema_arrow.get_field_index("ts")
        return pf.schema.column(idx).physical_type == "INT64"
    except Exception:
        return False


def load_tables(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> dict[str, DataFrame]:
    return {t: load_table(spark, t, sf_dir) for t in TABLES}


def load_table_spread(
    spark: SparkSession, name: str, sf_dir: str = DEFAULT_SF_DIR, key: str | None = None
) -> DataFrame:
    """Load a table and guarantee at least defaultParallelism partitions.

    Small single-file parquet inputs (one row group) arrive as ONE scan
    partition, which serializes CPU-heavy downstream work (md5 minhashes,
    shingling, vector scoring) onto one core. Repartition by the given key
    when — and only when — the scan is narrower than the cluster: on a real
    100 TB table the scan already has thousands of splits and this is a
    no-op, so the extra shuffle exists only in the small-file regime where
    it is trivially cheap.
    """
    df = load_table(spark, name, sf_dir)
    target = spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        df = df.repartition(target, key) if key else df.repartition(target)
    return df


def register_views(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> None:
    """Register all testdata tables as temp views for spark.sql queries."""
    for t in TABLES:
        load_table(spark, t, sf_dir).createOrReplaceTempView(t)
