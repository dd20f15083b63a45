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
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def load_tables(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> dict[str, DataFrame]:
    return {t: load_table(spark, t, sf_dir) for t in TABLES}


def register_views(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> None:
    """Register all testdata tables as temp views for spark.sql queries."""
    for t in TABLES:
        load_table(spark, t, sf_dir).createOrReplaceTempView(t)
