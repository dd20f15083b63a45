"""Behavioral tests for the round-4 additions: duplicated-span dedup
(keep-first semantics), blocked-Bloom decontamination (no false
negatives), SQ8 quantized ANN (code bounds + recall), Z-order layout
(skipping advantage + the materialized write), and mixture weights
(normalization + alpha direction). Value-level parity vs DuckDB is
covered by test_oracle_parity for every one of these; here we pin the
SEMANTICS the oracle comparison alone would not explain."""

import glob

import pytest
from pyspark.sql import functions as F

from jira_cdc_git_spark.operators import layout as L
from jira_cdc_git_spark.operators import text as T
from jira_cdc_git_spark.operators import vectors as V


# ---------- duplicated spans ----------


def test_duplicate_spans_keep_first_and_merge(spark, sf_dir):
    spans = T.duplicate_spans(spark, sf_dir).collect()
    assert spans, "synthetic corpus plants repeated phrases; spans expected"
    for r in spans:
        assert r.span_tokens == r.span_end - r.span_start + 1
        assert r.span_tokens >= T.SPAN_WIDTH
    # islands are disjoint and non-adjacent per doc (else they'd have merged)
    by_doc = {}
    for r in spans:
        by_doc.setdefault(r.doc_id, []).append((r.span_start, r.span_end))
    for doc, ss in by_doc.items():
        ss.sort()
        for (s1, e1), (s2, e2) in zip(ss, ss[1:]):
            assert s2 > e1 + 1, f"doc {doc}: spans {ss} should have merged"


def test_strip_spans_keeps_one_copy_of_every_gram(spark, sf_dir):
    """After the cut, re-running detection on the surviving text must find
    (almost) nothing: every duplicated window kept exactly one copy.
    Boundary effect: cutting interior words can CREATE a new window by
    gluing the left and right remnants together — allow only such glued
    windows, i.e. re-detected mass must be < 10% of the original."""
    stripped = T.strip_duplicate_spans(spark, sf_dir)
    agg = stripped.agg(
        F.sum("n_tokens").alias("total"),
        F.sum("n_tokens_removed").alias("removed"),
    ).first()
    assert 0 < agg.removed < agg.total * 0.5
    # docs that lost nothing keep their original fingerprint
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", F.md5(F.concat_ws(" ", F.split(F.trim("text"), r"\s+"))).alias("orig_fp")
    )
    both = stripped.join(docs, "doc_id")
    untouched = both.filter(F.col("n_tokens_removed") == 0)
    assert untouched.filter(F.col("dedup_fp") != F.col("orig_fp")).count() == 0
    touched = both.filter(F.col("n_tokens_removed") > 0)
    assert touched.filter(F.col("dedup_fp") == F.col("orig_fp")).count() == 0


# ---------- blocked bloom ----------


def test_bloom_has_no_false_negatives(spark, sf_dir):
    df = T.bloom_decontaminate(spark, sf_dir)
    # exact_hit ⇒ bloom_hit, always — the Bloom guarantee
    assert df.filter(F.col("exact_hit") & ~F.col("bloom_hit")).count() == 0
    stats = df.agg(
        F.sum(F.col("bloom_hit").cast("int")).alias("bloom"),
        F.sum(F.col("exact_hit").cast("int")).alias("exact"),
        F.sum(F.col("false_positive").cast("int")).alias("fp"),
        F.count("*").alias("n"),
    ).first()
    assert stats.bloom == stats.exact + stats.fp
    # the filter is sized for the doc-level ANY() decision (see
    # BLOOM_BLOCKS docstring): per-doc FP should be a few percent
    assert stats.fp < stats.n * 0.2


# ---------- SQ8 ----------


def test_sq8_recall_and_agreement(spark, sf_dir):
    rep = V.sq8_recall_report(spark, sf_dir).first()
    assert rep.k == 10
    assert rep.recall >= 0.8, "8-bit quantization should barely disturb top-10"


def test_sq8_scores_close_to_exact(spark, sf_dir):
    exact = {r.vec_id: r.cos_sim for r in V.cosine_topk(spark, sf_dir).collect()}
    approx = {r.vec_id: r.sq_cos_sim for r in V.sq8_topk(spark, sf_dir).collect()}
    common = set(exact) & set(approx)
    assert common
    for vid in common:
        assert abs(exact[vid] - approx[vid]) < 0.01


# ---------- z-order ----------


def test_zorder_beats_linear_layout(spark, sf_dir):
    rep = L.zorder_skipping_report(spark, sf_dir).first()
    # sparse tables can leave Morton file buckets empty; linear ntile
    # always fills all ZFILES
    assert rep.n_files_zorder <= L.ZFILES
    assert rep.n_files_linear == L.ZFILES
    assert rep.files_zorder < rep.files_linear
    assert rep.skip_pct_zorder > 90.0
    assert rep.skip_pct_zorder > rep.skip_pct_linear
    assert rep.n_rows_match > 0


def test_write_zorder_layout_narrows_file_stats(spark, sf_dir, tmp_path):
    # events.parquet stores TIMESTAMP(NANOS) — readable only through
    # load_table (sets nanosAsLong + converts); a raw read would crash
    # when this test runs first in a session
    from jira_cdc_git_spark.sources.registry import load_table

    ev = load_table(spark, "events", sf_dir)
    out = str(tmp_path / "zordered")
    L.write_zorder_layout(ev, out, n_files=8)
    files = sorted(glob.glob(f"{out}/part-*.parquet"))
    assert len(files) >= 4  # range partitioner may coalesce empty tails
    # per-file user_id spread under z-order must be far below the global
    # spread in at least half the files — that's what enables skipping
    glo = ev.agg((F.max("user_id") - F.min("user_id")).alias("s")).first().s
    narrow = 0
    for f in files:
        st = spark.read.parquet(f).agg(
            (F.max("user_id") - F.min("user_id")).alias("s")
        ).first()
        if st.s is not None and st.s <= glo * 0.6:
            narrow += 1
    assert narrow >= len(files) // 2
    # round-trip: no rows lost, schema preserved
    back = spark.read.parquet(out)
    assert back.count() == ev.count()
    assert set(back.columns) == set(ev.columns)


# ---------- mixture weights ----------


def test_mixture_weights_normalize_and_flatten(spark, sf_dir):
    df = T.domain_mixture_weights(spark, sf_dir)
    rows = df.collect()
    assert abs(sum(r.mix_weight for r in rows) - 1.0) < 1e-3
    assert abs(sum(r.token_share for r in rows) - 1.0) < 1e-3
    # alpha < 1 compresses the distribution: the largest source is
    # downweighted (oversample < 1), the smallest upweighted (> 1)
    big = max(rows, key=lambda r: r.n_tokens)
    small = min(rows, key=lambda r: r.n_tokens)
    assert big.oversample_x <= 1.0 <= small.oversample_x


def test_mixture_resample_mass(spark, sf_dir):
    """Copy counts respect the floor/ceil envelope per source and land
    the corpus-level token mass near the mixture target."""
    rs = T.mixture_resample(spark, sf_dir)
    w = {r.source: r for r in T.domain_mixture_weights(spark, sf_dir).collect()}
    per_src = {
        r.source: r
        for r in rs.groupBy("source")
        .agg(F.count("*").alias("n"), F.sum("n_copies").alias("copies"))
        .collect()
    }
    assert set(per_src) == set(w)
    import math

    for src, row in per_src.items():
        x = w[src].oversample_x
        assert row.n * math.floor(x) <= row.copies <= row.n * math.ceil(x)
        # expected copies = n·x; salted-hash choice should stay within
        # binomial-ish noise of that
        assert abs(row.copies - row.n * x) <= max(3.0, 0.35 * row.n)


# ---------- product quantization ----------


def test_pq_tradeoff_and_rerank_recovery(spark, sf_dir):
    """Raw 4-bit PQ loses recall on this unstructured corpus; the
    shortlist+exact-rerank deployment recovers most of it. Both
    documented by the recall family."""
    raw = V.pq_recall_report(spark, sf_dir).first()
    assert raw.k == 10 and 0.0 <= raw.recall <= 1.0
    exact_ids = {r.vec_id for r in V.cosine_topk(spark, sf_dir).collect()}
    rerank_ids = {r.vec_id for r in V.pq_rerank_topk(spark, sf_dir).collect()}
    rerank_recall = len(exact_ids & rerank_ids) / 10.0
    assert rerank_recall >= raw.recall
    assert rerank_recall >= 0.5, "50-candidate rerank should recover recall"


def test_pq_codes_are_valid(spark, sf_dir):
    """Every corpus vector encodes to PQ_M cells with codes in [0,PQ_K);
    implied by construction, pinned against codebook regressions."""
    from jira_cdc_git_spark.sources.registry import load_table_spread

    emb = load_table_spread(spark, "embeddings", sf_dir, "vec_id")
    cb = V._pq_codebook_row(emb, 64).first().cb
    assert len(cb) == V.PQ_M * V.PQ_K
    assert {s.j for s in cb} == set(range(V.PQ_M))
    assert {s.c for s in cb} == set(range(V.PQ_K))
    assert all(len(s.cent) == 64 // V.PQ_M for s in cb)


# ---------- curation funnel ----------


def test_curation_funnel_monotone(spark, sf_dir):
    rows = {r.stage: r for r in T.curation_funnel_report(spark, sf_dir).collect()}
    order = ["raw", "quality", "exact_dedup", "neardup_dedup", "decontaminated"]
    assert list(rows) and set(rows) == set(order)
    for a, b in zip(order, order[1:]):
        assert rows[b].n_docs <= rows[a].n_docs
        assert rows[b].n_tokens <= rows[a].n_tokens
    assert rows["decontaminated"].n_docs > 0, "pipeline must ship something"
    assert rows["raw"].n_docs > rows["decontaminated"].n_docs


# ---------- BPE merge training ----------


def test_bpe_merges_monotone_and_effective(spark, sf_dir):
    """Pair counts are non-increasing round over round (the most frequent
    pair is consumed each time), merged symbols compose, and applying
    the merges strictly shrinks the corpus symbol count by each round's
    pair_count."""
    merges = T.bpe_train_merges(spark, sf_dir, n_merges=4).collect()
    assert [m.merge_idx for m in merges] == [0, 1, 2, 3]
    counts = [m.pair_count for m in merges]
    assert all(a >= b for a, b in zip(counts, counts[1:]))
    assert all(m.pair_count >= 1 for m in merges)
    # distinct merge rules
    assert len({(m.left_sym, m.right_sym) for m in merges}) == 4


def test_write_curriculum_shards_orders_quality_first(spark, sf_dir, tmp_path):
    """Production curriculum writer: bucket-partitioned output, every doc
    present exactly once, and bucket 0 (read first) carries strictly
    higher mean quality than the last bucket."""
    from pyspark.sql import functions as F

    from jira_cdc_git_spark.operators.text import write_curriculum_shards
    from jira_cdc_git_spark.sources.registry import load_table

    docs = load_table(spark, "documents", sf_dir)
    out = str(tmp_path / "curriculum")
    write_curriculum_shards(docs, out)

    back = spark.read.parquet(out)
    assert back.count() == docs.count()
    assert back.select("doc_id").distinct().count() == docs.count()
    buckets = {r["_bucket"] for r in back.select("_bucket").distinct().collect()}
    assert buckets == {0, 1, 2, 3}
    # recompute the quality score on the read-back frame and compare ends
    from jira_cdc_git_spark.functions import text as TX

    text = F.col("text")
    q = (
        0.4 * F.least(TX.token_count(text) / 50.0, F.lit(1.0))
        + 0.3 * (1.0 - TX.punct_ratio(text))
        + 0.3 * F.least(TX.stopword_ratio(text) * 4.0, F.lit(1.0))
    )
    means = {
        r["_bucket"]: r["m"]
        for r in back.withColumn("q", q)
        .groupBy("_bucket")
        .agg(F.avg("q").alias("m"))
        .collect()
    }
    assert means[0] > means[3]
