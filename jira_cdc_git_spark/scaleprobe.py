"""Scale-probe data generator: replicate an sf-directory K× with shifted
keys so the bench can measure how each operator's cost grows with data
size (VERDICT r3 task 6 — expose superlinear candidate growth in the
pair-generating operators before it shows up at 100 TB).

Design constraints:
  * Key consistency — every foreign key is shifted by the same
    per-replica stride, so joins (orders↔customer, lineitem↔orders,
    and the o_orderkey-derived JIRA fixture algebra in fixtures.py)
    stay internally consistent inside each replica. Replicas never
    cross-join: a replica is a disjoint "tenant" of the same shape.
  * Content divergence — replicated *text* is passed through a
    per-replica vowel rotation (``translate``) and *embeddings* through
    a per-replica cyclic rotation, so near-dup/ANN operators see K× the
    corpus, not K identical copies (10 identical copies would make
    every doc a 9-way duplicate and quadratically inflate candidate
    pairs — a data artifact, not an algorithmic cost).
  * All transformations are JVM-side column expressions (translate,
    slice, concat); generation is one scan + one write per table with
    a broadcast replica cross-join — no shuffle, no Python rows.

Dimension tables (region, nation) are copied verbatim: at 100 TB the
dims stay broadcast-small; replicating them would distort join plans.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from jira_cdc_git_spark.sources.registry import load_table

#: per-replica key offset — far above any real key at the SFs we probe
STRIDE = 10_000_000

#: integer/bigint key columns shifted per replica, per fact table
_KEY_SHIFTS: dict[str, list[str]] = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}

_DIMS = ("region", "nation")

_ALPHA = "abcdefghijklmnopqrstuvwxyz"


def _rotation(r: int) -> str:
    """Replica-r Caesar alphabet: distinct non-identity substitution for
    every r in 1..25 (a 5-vowel rotation was tried first and silently
    repeated the identity at r=5, handing every doc an exact cross-
    replica twin — which quadratically inflated near-dup candidates and
    made the probe read as an algorithmic blowup)."""
    k = r % len(_ALPHA)
    return _ALPHA[k:] + _ALPHA[:k]


def _replicate(df: DataFrame, factor: int) -> DataFrame:
    """Cross-join with a broadcast replica index — one narrow fan-out."""
    reps = df.sparkSession.range(factor).withColumnRenamed("id", "__r")
    return df.crossJoin(F.broadcast(reps))


def build_scaled_dir(
    spark: SparkSession, src_dir: str, out_dir: str, factor: int = 10
) -> str:
    """Write a ``factor``× key-shifted replica set of ``src_dir`` tables
    into ``out_dir`` (same ``<table>.parquet`` layout). Returns out_dir.
    """
    os.makedirs(out_dir, exist_ok=True)

    # read through load_table, not raw spark.read: events.parquet may ship
    # as TIMESTAMP(NANOS), which a raw read rejects — load_table sniffs
    # and normalizes, and the scaled copy is written back as plain MICROS
    # timestamps every operator reads natively.
    for t in _DIMS:
        load_table(spark, t, src_dir).write.mode("overwrite").parquet(
            f"{out_dir}/{t}.parquet"
        )

    for t, keys in _KEY_SHIFTS.items():
        df = _replicate(load_table(spark, t, src_dir), factor)
        for k in keys:
            df = df.withColumn(k, F.col(k) + F.col("__r") * F.lit(STRIDE))

        if t == "documents":
            # Caesar-rotate letters per replica: keeps length/word
            # structure and intra-replica duplicate families, breaks
            # cross-replica shingle identity so pair growth reflects the
            # algorithm, not cloned text.
            branch = F.col("text")
            for r in range(1, factor):
                branch = F.when(
                    F.col("__r") == r,
                    F.translate(F.col("text"), _ALPHA, _rotation(r)),
                ).otherwise(branch)
            df = df.withColumn("text", branch)
            # translate preserves length, so n_chars stays valid.
        elif t == "embeddings":
            # Cyclic rotation per replica: preserves norms and
            # intra-replica geometry, decorrelates replicas.
            dim = F.size(F.col("embedding"))
            sh = (F.col("__r") % dim).cast("int")
            df = df.withColumn(
                "embedding",
                F.when(sh == 0, F.col("embedding")).otherwise(
                    F.concat(
                        F.slice(F.col("embedding"), sh + F.lit(1), dim - sh),
                        F.slice(F.col("embedding"), F.lit(1), sh),
                    )
                ),
            )

        df.drop("__r").write.mode("overwrite").parquet(
            f"{out_dir}/{t}.parquet"
        )

    return out_dir
