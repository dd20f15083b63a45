"""Graph / hierarchy operators (SURVEY §2.3 J1, J2; pkg/epic).

The reference builds an epic→story→subtask hierarchy with an in-memory
parent map and recurses to max depth 5 (pkg/epic/jira_analyzer.go:250-311,
pkg/epic/analyzer.go:91,102). Spark has no recursive CTE, so the idiomatic
restatement is an iterative self-join to fixpoint, driven from the driver
with one persisted frontier per level — O(depth) shuffles, each a key-key
equi-join that AQE broadcasts when the frontier is small (epics are ≤ ~1000
issues in the reference's own benchmarks).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from jira_cdc_git_spark.sources.registry import load_table

MAX_DEPTH = 5  # reference cap: pkg/epic/analyzer.go:91


def hierarchy_levels(
    nodes: DataFrame,
    key_col: str = "key",
    parent_col: str = "parent_key",
    max_depth: int = MAX_DEPTH,
) -> DataFrame:
    """Assign a level to every node reachable from a root (parent IS NULL)
    within ``max_depth`` edges, via iterative self-join.

    Returns (key, parent, level). Nodes deeper than max_depth (or in cycles)
    are excluded — mirroring the reference's recursion cap
    (pkg/epic/jira_analyzer.go:250-311).

    Scale: each iteration joins the full edge set against the (small)
    current frontier — broadcast the frontier, persist each level, and the
    loop is `max_depth` broadcast joins with no growing lineage.
    """
    edges = nodes.select(
        F.col(key_col).alias("key"), F.col(parent_col).alias("parent")
    )
    frontier = edges.filter(F.col("parent").isNull()).withColumn("level", F.lit(0))
    levels = [frontier]
    for _ in range(max_depth):
        parents = frontier.select(
            F.col("key").alias("pk"), (F.col("level") + 1).alias("child_level")
        )
        frontier = (
            edges.join(F.broadcast(parents), edges.parent == parents.pk)
            .select("key", "parent", F.col("child_level").alias("level"))
        )
        frontier.persist()
        if frontier.isEmpty():
            frontier.unpersist()
            break
        levels.append(frontier)
    out = levels[0]
    for lv in levels[1:]:
        out = out.unionByName(lv)
    return out


def hierarchy_over_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1 driver-facing parity query: impose a synthetic binary hierarchy on
    `orders` (node i's parent is i//2 over the row_number-densified key
    space) and compute levels 0..5. The DuckDB oracle is the equivalent
    WITH RECURSIVE query.

    The global row_number is a parity-test artifact (single-partition
    window); production hierarchies come with real parent keys and skip it.
    """
    orders = load_table(spark, "orders", sf_dir)
    w = Window.orderBy("o_orderkey")
    nodes = orders.select("o_orderkey").withColumn(
        "rn", F.row_number().over(w)
    )
    nodes = nodes.select(
        F.col("rn").alias("key"),
        F.when(F.col("rn") >= 2, (F.col("rn") / 2).cast("int")).alias("parent_key"),
    )
    out = hierarchy_levels(nodes, "key", "parent_key", MAX_DEPTH)
    return out.select("key", "parent", "level")


def broken_links(edges: DataFrame, issues: DataFrame, dst_col: str = "dst_key") -> DataFrame:
    """J2 — references whose target doesn't exist (reference:
    validateCompleteness pkg/epic/jira_analyzer.go:326-356 collects
    BrokenLinks). left_anti against the issue key set."""
    return edges.join(
        issues.select(F.col("key").alias("__k")),
        edges[dst_col] == F.col("__k"),
        "left_anti",
    )
