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


def materialize(df: DataFrame, lazy: bool = False) -> DataFrame:
    """Cut the plan here and materialize the result once, per the session's
    configured strategy. Returns a DataFrame whose consumers re-read the
    materialized blocks instead of recomputing the upstream plan.

    ``lazy`` (local strategy only) defers block computation to the FIRST
    consuming job: the marking itself schedules nothing, so the
    materialize site costs zero dedicated Spark jobs while still
    truncating lineage. Measured trade-off (sf0.1, local[32], r12):

    * lazy WINS on sequential iterative loops whose per-round frames
      are cheap (HITS half-steps, k-core peels, star rounds, LPA):
      dozens of eager jobs of ~0.1-0.2 s scheduling floor disappear —
      hits_scores 5.7 -> 4.8 s, link_components 6.2 -> 5.3 s.
    * lazy LOSES — badly — when the frame is expensive and feeds MANY
      CONCURRENT consumers (the LSH band self-joins, tfidf's weight
      table): parallel broadcast-build jobs race to compute the
      not-yet-persisted blocks, duplicating the whole upstream plan
      per consumer (neardup_pairs_lsh 1.2 -> 8.5 s in the r12
      mid-round bench; tfidf 3.5 -> 6.4 s same-session A/B).

    Hence the default is EAGER (compute once, race-free — any new call
    site is safe) and the iterative loops that measurably win opt in
    via :func:`materialize_lazy`."""
    s = strategy(df)
    if s == "local":
        return df.localCheckpoint(eager=not lazy)
    if s == "disk":
        from pyspark.storagelevel import StorageLevel

        out = df.persist(StorageLevel.DISK_ONLY)
        out.count()  # eager: consumers must not race the first computation
        return out
    return df.checkpoint(eager=True)


def materialize_lazy(df: DataFrame) -> DataFrame:
    """materialize() with deferred (first-consumer) block computation —
    for sequential iterative loops; see the trade-off note above."""
    return materialize(df, lazy=True)
