"""Multi-dimensional data-layout operators: Z-order (Morton) clustering
and the file-skipping report that justifies it.

At 100 TB the cheapest query is the one that never reads the file: engines
skip whole files/row-groups whose min/max stats exclude the predicate.
Sorting by ONE column gives perfect skipping on that column and none on
any other; interleaving the bits of two rank-bucketized columns (Z-order,
the Delta/Iceberg OPTIMIZE ZORDER BY idea) gives good skipping on BOTH.
`zorder_skipping_report` quantifies that: it simulates the two layouts
(Morton files vs insertion-order files), computes per-file min/max of the
query dimensions, and counts how many files a box predicate must touch
under each — the planning report you run before rewriting a 100 TB table.

Scale notes: the report ranks both dimensions with exact percent_rank
(global-sort windows) so the DuckDB oracle replays it bit-for-bit; on a
real table the rank boundaries come from approx quantiles broadcast to a
narrow bucketize pass, and the layout WRITE itself is
`write_zorder_layout` below — a repartitionByRange on the Morton key
(sampling-based range partitioner, no global sort on the executors'
critical path) + sortWithinPartitions, which is exactly how engines
implement OPTIMIZE ZORDER.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from jira_cdc_git_spark.sources.registry import load_table

#: bits per dimension in the Morton code (64 rank buckets per dim).
ZBITS = 6
#: simulated file count: 4096 Morton codes / 16 codes per file.
ZFILES = 256
#: box predicate in rank-bucket space — the bottom ⅛×⅛ corner, i.e.
#: "user_id below its 12.5th percentile AND value below its 12.5th".
ZBOX = 8


def morton_code(bx: Column, by: Column, bits: int = ZBITS) -> Column:
    """Interleave the low `bits` bits of two bucket ids: x bits land on
    odd positions, y on even — plain shift/mask arithmetic, identical
    expression in Spark and DuckDB (`morton_sql` below)."""
    out = F.lit(0).cast("long")
    for i in range(bits):
        out = out + F.shiftleft(
            F.shiftright(bx, i).bitwiseAND(F.lit(1)).cast("long"), 2 * i + 1
        )
        out = out + F.shiftleft(
            F.shiftright(by, i).bitwiseAND(F.lit(1)).cast("long"), 2 * i
        )
    return out


def morton_sql(bx: str, by: str, bits: int = ZBITS) -> str:
    """The DuckDB rendering of morton_code — generated from the same
    constants so oracle and engine can never drift."""
    terms = []
    for i in range(bits):
        terms.append(f"((({bx} >> {i}) & 1) << {2 * i + 1})")
        terms.append(f"((({by} >> {i}) & 1) << {2 * i})")
    return " + ".join(terms)


def _bucketized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events + rank buckets on (user_id, value) + simulated file ids for
    the Morton layout and the insertion-order (ts) layout."""
    ev = load_table(spark, "events", sf_dir)
    n = 1 << ZBITS
    w_u = Window.orderBy("user_id", "event_id")
    w_v = Window.orderBy("value", "event_id")
    w_t = Window.orderBy("ts", "event_id")
    bx = F.least(F.lit(n - 1), F.floor(F.percent_rank().over(w_u) * n)).cast("int")
    by = F.least(F.lit(n - 1), F.floor(F.percent_rank().over(w_v) * n)).cast("int")
    return ev.select(
        "event_id",
        bx.alias("bx"),
        by.alias("by"),
        F.ntile(ZFILES).over(w_t).alias("file_linear"),
    ).withColumn(
        "file_zorder",
        F.floor(morton_code(F.col("bx"), F.col("by")) / ((1 << (2 * ZBITS)) // ZFILES)).cast("int"),
    )


def zorder_skipping_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-row layout comparison: for the ZBOX×ZBOX rank-space corner
    predicate, how many of the ZFILES files must be read under the
    Morton layout vs the insertion-order layout, by min/max-stats
    overlap — exactly the pruning a parquet reader performs. The
    headline number is skip_pct_zorder vs skip_pct_linear."""
    b = _bucketized(spark, sf_dir)

    def touched(file_col: str, suffix: str) -> DataFrame:
        # the box anchors at bucket 0, so range-overlap reduces to the
        # file's min falling under the box's upper edge on both dims.
        # n_files is per-layout: sparse tables leave some Morton file
        # buckets empty, so the two layouts can have different counts.
        stats = b.groupBy(file_col).agg(
            F.min("bx").alias("mn_x"),
            F.min("by").alias("mn_y"),
        )
        return stats.agg(
            F.count("*").alias(f"n_files_{suffix}"),
            F.sum(
                ((F.col("mn_x") < ZBOX) & (F.col("mn_y") < ZBOX)).cast("long")
            ).alias(f"files_{suffix}"),
        )

    z = touched("file_zorder", "zorder")
    l = touched("file_linear", "linear")
    matches = b.filter((F.col("bx") < ZBOX) & (F.col("by") < ZBOX)).agg(
        F.count("*").alias("n_rows_match")
    )
    return (
        z.crossJoin(F.broadcast(l))
        .crossJoin(F.broadcast(matches))
        .select(
            "n_rows_match",
            "n_files_zorder",
            "files_zorder",
            "n_files_linear",
            "files_linear",
            F.round(
                (1 - F.col("files_zorder") / F.col("n_files_zorder")) * 100, 2
            ).alias("skip_pct_zorder"),
            F.round(
                (1 - F.col("files_linear") / F.col("n_files_linear")) * 100, 2
            ).alias("skip_pct_linear"),
        )
    )


def _quantile_bucket(col_name: str, cuts: list[float]) -> Column:
    """0-based bucket id of col against sorted cut points — a chain of
    comparisons against broadcast literals; purely narrow."""
    out = F.lit(0)
    for c in cuts:
        out = out + (F.col(col_name) > F.lit(float(c))).cast("int")
    return out


def write_zorder_layout(
    ev: DataFrame, out_dir: str, n_files: int = 64
) -> None:
    """Materialize the Morton layout the way a production OPTIMIZE
    ZORDER does: rank-bucket boundaries come from approxQuantile (one
    sampling pass, boundaries broadcast into a narrow bucketize
    expression — NO global-sort window anywhere), then range-partition
    on the Morton key (sampled range partitioner), sort within
    partitions, one file per partition. Readers then skip files via
    parquet min/max on BOTH user_id and value. The exact-percent_rank
    form lives only in the oracle-checked DIAGNOSTIC report above."""
    n = 1 << ZBITS
    probs = [i / n for i in range(1, n)]
    cuts_u = ev.approxQuantile("user_id", probs, 0.001)
    cuts_v = ev.approxQuantile("value", probs, 0.001)
    bx = _quantile_bucket("user_id", cuts_u).cast("int")
    by = _quantile_bucket("value", cuts_v).cast("int")
    keyed = ev.withColumn("_z", morton_code(bx, by))
    (
        keyed.repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(out_dir)
    )
