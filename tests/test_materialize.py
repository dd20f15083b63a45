"""Materialization-strategy tests: the iterative operators must produce
identical results under local / disk / checkpoint strategies, and the
disk strategy must retain lineage (fault tolerance on a real cluster)."""

import pytest
from pyspark.sql import functions as F

from jira_cdc_git_spark.materialize import CONF_KEY, materialize
from jira_cdc_git_spark.operators import graph as G
from jira_cdc_git_spark.operators import text as T


@pytest.fixture
def strategy_conf(spark, tmp_path):
    prev = spark.conf.get(CONF_KEY, "local")
    spark.sparkContext.setCheckpointDir(str(tmp_path / "ckpt"))

    def _set(s):
        spark.conf.set(CONF_KEY, s)

    yield _set
    spark.conf.set(CONF_KEY, prev)


@pytest.mark.parametrize("strat", ["local", "disk", "checkpoint"])
def test_hierarchy_identical_under_all_strategies(
    spark, sf_dir, strategy_conf, strat
):
    strategy_conf("local")
    base = sorted(
        (r["key"], r["parent"], r["level"])
        for r in G.hierarchy_over_orders(spark, sf_dir).collect()
    )
    strategy_conf(strat)
    got = sorted(
        (r["key"], r["parent"], r["level"])
        for r in G.hierarchy_over_orders(spark, sf_dir).collect()
    )
    assert got == base


@pytest.mark.parametrize("strat", ["disk", "checkpoint"])
def test_neardup_identical_under_cluster_strategies(
    spark, sf_dir, strategy_conf, strat
):
    strategy_conf("local")
    base = sorted(
        (r["doc_a"], r["doc_b"]) for r in T.neardup_pairs_lsh(spark, sf_dir).collect()
    )
    strategy_conf(strat)
    got = sorted(
        (r["doc_a"], r["doc_b"]) for r in T.neardup_pairs_lsh(spark, sf_dir).collect()
    )
    assert got == base


def test_disk_strategy_keeps_lineage(spark, strategy_conf):
    strategy_conf("disk")
    df = materialize(spark.range(100).withColumn("x", F.col("id") * 2))
    # lineage retained: the logical plan still reaches the Range source
    # (localCheckpoint would truncate to an RDD scan)
    logical = df._jdf.queryExecution().logical().toString()
    assert "Range" in logical or "InMemoryRelation" in logical
    assert df.storageLevel.useDisk and not df.storageLevel.useMemory
    df.unpersist()


def test_local_strategy_truncates_lineage(spark, strategy_conf):
    strategy_conf("local")
    df = materialize(spark.range(100))
    assert "LogicalRDD" in df._jdf.queryExecution().logical().toString()


def test_unknown_strategy_rejected(spark, strategy_conf):
    strategy_conf("ram")
    with pytest.raises(ValueError):
        materialize(spark.range(1))
