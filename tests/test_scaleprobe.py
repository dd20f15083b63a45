"""Scale-probe generator invariants (scaleprobe.build_scaled_dir):
replica counts, key disjointness/join consistency, and text/embedding
divergence across replicas — the properties the sf1 bench section
depends on for honest ratios (a buggy replicator that clones text
verbatim reads as quadratic candidate growth in the pair operators).
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from jira_cdc_git_spark.scaleprobe import STRIDE, build_scaled_dir

SRC = "/root/testdata/sf0.001"
FACTOR = 3
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_probe_list_covers_new_headline_queries():
    """Every headline bench query added this round (i.e. not yet seen in
    ANY committed CORRECTNESS artifact) must ship with an sf1 scale-probe
    entry IN THE SAME COMMIT — the r7 wave shipped ~17 operators unprobed
    and r8 shipped 2 more (tokenizer_fertility_report,
    source_lang_entropy); this makes the drift pattern structurally
    impossible (r8 verdict task 2)."""
    import bench

    seen: set[str] = set()
    for f in glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json")):
        with open(f) as fh:
            seen.update(json.load(fh))
    new = [n for n in bench.BENCH_QUERIES if n not in seen]
    missing = [n for n in new if n not in bench.SCALE_PROBE_QUERIES]
    assert not missing, (
        "headline queries added this round lack a scale-probe entry "
        f"(every new op ships with a measured sf1 ratio): {missing}"
    )
    # the two r8 stragglers are now probed explicitly
    assert "tokenizer_fertility_report" in bench.SCALE_PROBE_QUERIES
    assert "source_lang_entropy" in bench.SCALE_PROBE_QUERIES


@pytest.fixture(scope="module")
def scaled_dir(spark):
    out = tempfile.mkdtemp(prefix="scaleprobe_test_")
    build_scaled_dir(spark, SRC, out, factor=FACTOR)
    yield out
    shutil.rmtree(out, ignore_errors=True)


def test_fact_tables_replicate_dims_do_not(spark, scaled_dir):
    for t in ("orders", "lineitem", "documents", "embeddings", "events"):
        n_src = spark.read.parquet(f"{SRC}/{t}.parquet").count()
        n_out = spark.read.parquet(f"{scaled_dir}/{t}.parquet").count()
        assert n_out == FACTOR * n_src, t
    for t in ("region", "nation"):
        n_src = spark.read.parquet(f"{SRC}/{t}.parquet").count()
        n_out = spark.read.parquet(f"{scaled_dir}/{t}.parquet").count()
        assert n_out == n_src, t


def test_keys_stay_unique_and_joins_stay_consistent(spark, scaled_dir):
    orders = spark.read.parquet(f"{scaled_dir}/orders.parquet")
    assert orders.select("o_orderkey").distinct().count() == orders.count()
    # every lineitem still finds its order, and only within its replica
    li = spark.read.parquet(f"{scaled_dir}/lineitem.parquet")
    orphans = li.join(orders, li.l_orderkey == orders.o_orderkey, "left_anti")
    assert orphans.count() == 0
    # every order still finds its customer
    cust = spark.read.parquet(f"{scaled_dir}/customer.parquet")
    assert (
        orders.join(cust, orders.o_custkey == cust.c_custkey, "left_anti").count()
        == 0
    )


def test_replica_text_diverges_but_structure_survives(spark, scaled_dir):
    docs = spark.read.parquet(f"{scaled_dir}/documents.parquet")
    base = docs.withColumn("base_id", F.col("doc_id") % STRIDE).withColumn(
        "replica", (F.col("doc_id") / STRIDE).cast("long")
    )
    # same base doc: equal length in every replica (Caesar is 1:1) ...
    per_base = base.groupBy("base_id").agg(
        F.countDistinct("n_chars").alias("n_lens"),
        F.countDistinct("text").alias("n_texts"),
        F.count("*").alias("n"),
    )
    assert per_base.filter(F.col("n_lens") != 1).count() == 0
    # ... but the text itself differs in every replica (no cloned twins)
    assert per_base.filter(
        (F.col("n") == FACTOR) & (F.col("n_texts") != FACTOR)
    ).count() == 0


def test_embeddings_rotate_but_keep_norm(spark, scaled_dir):
    emb = spark.read.parquet(f"{scaled_dir}/embeddings.parquet")
    norm = F.sqrt(
        F.aggregate(
            "embedding", F.lit(0.0), lambda acc, x: acc + x.cast("double") * x
        )
    )
    base = emb.withColumn("base_id", F.col("vec_id") % STRIDE).withColumn(
        "n2", F.round(norm, 4)
    )
    per_base = base.groupBy("base_id").agg(
        F.countDistinct("n2").alias("n_norms"),
        F.countDistinct(F.col("embedding").cast("string")).alias("n_vecs"),
        F.count("*").alias("n"),
    )
    # rotation preserves the norm exactly ...
    assert per_base.filter(F.col("n_norms") != 1).count() == 0
    # ... and decorrelates the replicas (distinct vectors per replica)
    assert per_base.filter(
        (F.col("n") == FACTOR) & (F.col("n_vecs") != FACTOR)
    ).count() == 0


def test_committed_bench_artifact_shape():
    """The committed BENCH_LOCAL artifact for the CURRENT round (when
    present) must honor the probe invariants the round reviews audit:
    every SCALE_PROBE_QUERIES member has a measured ratio, every ratio
    at or above the borderline threshold carries median-of-3 samples
    (run_counts == 3), every headline query has a timing, and any ratio
    >= 10 names itself in SUPERLINEAR_BY_DESIGN. Guards the
    late-commit-drift pattern (r7: ~17 ops unprobed, r8: 2) at the
    artifact level, not just the list level."""
    import bench

    artifacts = sorted(glob.glob(os.path.join(REPO, "BENCH_LOCAL_r*.json")))
    assert artifacts, "no committed bench artifact"
    with open(artifacts[-1]) as fh:
        art = json.load(fh)
    # artifacts are per-round snapshots: only hold the CURRENT code's
    # artifact to the current lists (older rounds predate newer ops)
    queries = art.get("queries", {})
    sf1 = art.get("sf1", {})
    ratios = sf1.get("ratio_vs_base", {})
    if set(bench.BENCH_QUERIES) - set(queries):
        pytest.skip(
            "committed artifact predates the current BENCH_QUERIES — "
            "regenerate with bench.py before shipping the round"
        )
    missing_probe = [n for n in bench.SCALE_PROBE_QUERIES if n not in ratios]
    assert not missing_probe, missing_probe
    run_counts = sf1.get("run_counts", {})
    samples = sf1.get("ratio_samples", {})
    for name, ratio in ratios.items():
        if ratio >= bench.BORDERLINE_RATIO:
            assert run_counts.get(name) == 3, (name, ratio)
            assert len(samples.get(name, [])) == 3, (name, ratio)
        if ratio >= 10:
            assert name in bench.SUPERLINEAR_BY_DESIGN, (
                f"{name} measured {ratio}x without a superlinear_by_design "
                "justification"
            )
    band = art.get("variance_band", {})
    assert len(band) >= 10
    for name, b in band.items():
        assert b["min"] <= b["median"] <= b["max"], name
        assert b["n_runs"] >= 2, name
