"""Materialization strategy for iterative/multi-consumer intermediates
(round-2 verdict #4: bare ``localCheckpoint()`` everywhere is the fastest
single-node choice but not fault-tolerant — executor-local blocks die with
the executor and the truncated lineage makes recompute impossible).

One knob, read from the session conf:

    spark.conf.set("spark.jira_cdc_git.materialize", <strategy>)

* ``local`` (default) — ``localCheckpoint(eager)``: blocks on executor
  local store, lineage truncated. Fastest; right for local[N] and for
  clusters where re-running a failed query is acceptable.
* ``disk`` — ``persist(DISK_ONLY)`` + eager count: blocks on executor
  disk, **lineage retained** so lost blocks recompute from source. The
  cluster-safe default for long pipelines; pair with ``unpersist()`` via
  the returned handle if memory pressure matters.
* ``checkpoint`` — reliable ``checkpoint(eager)`` into
  ``sparkContext.setCheckpointDir`` (HDFS/S3): survives executor loss AND
  driver restarts of downstream stages; the strategy for 100 TB runs where
  an hour of recompute is unacceptable.

All iterative operators (graph hierarchy, LSH/banded dedup, k-means IVF)
route through :func:`materialize`, so the whole engine flips strategy with
one conf."""

from __future__ import annotations

from pyspark.sql import DataFrame

CONF_KEY = "spark.jira_cdc_git.materialize"
STRATEGIES = ("local", "disk", "checkpoint")


def strategy(df_or_spark) -> str:
    spark = getattr(df_or_spark, "sparkSession", df_or_spark)
    s = spark.conf.get(CONF_KEY, "local")
    if s not in STRATEGIES:
        raise ValueError(
            f"{CONF_KEY}={s!r}; expected one of {STRATEGIES}"
        )
    return s


def materialize(df: DataFrame) -> DataFrame:
    """Cut the plan here and materialize the result once, per the session's
    configured strategy. Returns a DataFrame whose consumers re-read the
    materialized blocks instead of recomputing the upstream plan."""
    s = strategy(df)
    if s == "local":
        # lazy: the blocks are computed by the FIRST consuming job (the
        # marking itself schedules nothing), so every materialize site
        # costs zero extra Spark jobs while still truncating lineage.
        # Iterative operators chain dozens of these — the eager form
        # paid one driver-scheduled job per call (measured ~0.1-0.2 s
        # each on local[32]), pure orchestration overhead at any scale.
        # Safe because all materialized frames are deterministic (the
        # repo bans rand()/uuid in query paths), so concurrent first
        # consumers can never observe divergent blocks.
        return df.localCheckpoint(eager=False)
    if s == "disk":
        from pyspark.storagelevel import StorageLevel

        out = df.persist(StorageLevel.DISK_ONLY)
        out.count()  # eager: consumers must not race the first computation
        return out
    return df.checkpoint(eager=True)
