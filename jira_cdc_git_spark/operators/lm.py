"""Trained language-model operators over `documents`: interpolated
Kneser-Ney n-gram perplexity (the CCNet/KenLM-style quality filter) and
a distilled logistic-regression quality classifier (the fastText-style
model-based filter) — the two model-based curation stages the r11
review listed as the remaining user-facing gaps (What's-missing #2/#3).

Both families follow the repo's integer-exact cross-engine discipline
(the micro-Lloyd / pagerank / spearman playbook):

* every COUNT is an exact integer aggregated distributively;
* every floating expression is a FIXED-SHAPE chain of IEEE ops over
  exact integers (individually correctly-rounded, hence bit-identical
  in Spark and DuckDB), floored to micro-units BEFORE any data-scale
  sum, so partial-aggregation order can never perturb a digit;
* iterative state (the GD weight vector) advances by EXACT integer
  floor-division, replayed in the oracle with a floor-div emulation
  that is exact in DuckDB regardless of sign (its native `//`
  truncates toward zero, Python's floors — the emulation removes the
  residue first so both agree).

Reference parity: the reference has no LM scoring — these extend the
quality_score / bigram_surprisal rule-based surface (SURVEY §2 LLM
families) with the trained-model stage public pipelines use (CCNet
Wikipedia-LM perplexity filtering; GPT-3/LLaMA quality classifiers).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from jira_cdc_git_spark.functions import text as TX
from jira_cdc_git_spark.materialize import materialize, materialize_lazy
from jira_cdc_git_spark.sources.registry import load_table_spread

# ---------------------------------------------------------------------------
# Interpolated Kneser-Ney trigram LM
# ---------------------------------------------------------------------------
# The 3-gram instantiation of interpolated KN (Chen & Goodman 1999)
# with one absolute discount per order, estimated per LANGUAGE (CCNet
# trains one LM per language). All count tables derive from the
# distinct-TRIGRAM-TYPE frame — the standard formulation when a
# pipeline stores only highest-order counts:
#
#   P3(w3|w1w2) = max(c123-D3,0)/c12* + D3·N1+(w1w2·)/c12* · P2(w3|w2)
#   P2(w3|w2)   = max(N1+(·w2w3)-D2,0)/N1+(·w2·)
#                 + D2·N1+(w2·)/N1+(·w2·) · P1(w3)
#   P1(w3)      = N1+(·w3)/N1+(··)         (unigram continuation)
#   D_n         = n1/(n1 + 2·n2)            (count-of-count estimate)
#
# c12* = Σ_w3 c123 (context totals). Scoring the training corpus
# itself (the per-shard perplexity monitor) means every scored trigram
# has c123 >= 1 — no zero-probability/OOV arm is ever taken, so the
# closed-form needs no unseen backoff path.

#: Discount fallback when a language has no singleton/doubleton mass
#: (degenerate tiny corpora only); shared with the oracle literal.
KN_DISCOUNT_FALLBACK = 0.5


def _kn_trigram_frame(docs: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(toks, trg): the tokenized corpus (>=3 tokens) and its exploded
    (lang, source, doc_id, w1, w2, w3) trigram occurrence frame —
    shared by _kn_tables and kn_perplexity_split's single-explode
    path."""
    toks = docs.select(
        "lang", "source", "doc_id", TX.tokens(F.col("text")).alias("toks")
    ).filter(F.size("toks") >= 3)
    trg = toks.select(
        "lang",
        "source",
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(1, size(toks) - 2),"
                " i -> struct(element_at(toks, i) AS w1,"
                " element_at(toks, i + 1) AS w2,"
                " element_at(toks, i + 2) AS w3))"
            )
        ).alias("g"),
    ).select("lang", "source", "doc_id", "g.w1", "g.w2", "g.w3")
    return toks, trg


def _kn_tables(docs: DataFrame) -> dict[str, DataFrame]:
    """The KN count-table family, all derived from one (lang, source,
    w1, w2, w3) occurrence aggregation. Every table is bounded by
    distinct-trigram-type count (corpus-sublinear), every groupBy is
    hash-distributed on its own key prefix."""
    toks, trg = _kn_trigram_frame(docs)
    # per-(source) occurrence counts — the scoring grain; the global
    # type counts fold from it (one corpus-scale shuffle total).
    # MATERIALIZED: seven downstream count tables consume occ/tri, and
    # without a cut each would re-scan and re-explode the corpus —
    # ~8 redundant 100 TB passes (the materialize-strategy knob picks
    # local blocks / DISK_ONLY / reliable checkpoint per deployment)
    # occ's two consumers are strictly sequential (tri's eager cut
    # below computes occ's blocks; the report's scoring join then reads
    # them) — the lazy mark saves occ's dedicated job
    occ = materialize_lazy(
        trg.groupBy("lang", "source", "w1", "w2", "w3").agg(
            F.count("*").cast("long").alias("m")
        )
    )
    tri = materialize(
        occ.groupBy("lang", "w1", "w2", "w3").agg(
            F.sum("m").cast("long").alias("c3")
        )
    )
    n_docs = toks.groupBy("lang", "source").agg(
        F.count("*").cast("long").alias("n_docs")
    )
    out = {"trg": trg, "occ": occ, "tri": tri, "n_docs": n_docs}
    out.update(_kn_derived_from_tri(tri))
    return out


def _kn_derived_from_tri(tri: DataFrame) -> dict[str, DataFrame]:
    """Every KN table that folds from the distinct-trigram-type frame —
    shared by _kn_tables and kn_perplexity_split's single-explode path
    (which derives `tri` from the per-doc grain instead of occ)."""
    c12 = tri.groupBy("lang", "w1", "w2").agg(
        F.sum("c3").cast("long").alias("c12s"),
        F.count("*").cast("long").alias("n1p12"),
    )
    # cont is re-consumed by FIVE downstream tables (c1, tot, mid, d2,
    # and the type-terms join) — cut it once so the (lang,w2,w3) fold
    # over the distinct-trigram frame doesn't re-shuffle per consumer
    cont = materialize_lazy(
        tri.groupBy("lang", "w2", "w3").agg(
            F.count("*").cast("long").alias("cnt")
        )
    )
    # mid folds from cont, not tri (r13): per (lang,w2), Σcnt over the
    # (lang,w2,w3) rows = |{(w1,w3)}| = count(*) over tri = mid2, and
    # count(*) of cont rows = |{w3}| = countDistinct(w3) over tri =
    # ctx2 — exact integer identities, measured off the SMALLER frame
    mid = cont.groupBy("lang", "w2").agg(
        F.sum("cnt").cast("long").alias("mid2"),
        F.count("*").cast("long").alias("ctx2"),
    )
    c1 = cont.groupBy("lang", "w3").agg(
        F.count("*").cast("long").alias("cont1")
    )
    tot = cont.groupBy("lang").agg(F.count("*").cast("long").alias("tot1"))
    return {"c12": c12, "cont": cont, "mid": mid, "c1": c1, "tot": tot}


def _kn_type_terms(t: dict[str, DataFrame]) -> DataFrame:
    """(lang, w1, w2, w3, term_u): -ln P_KN per trigram TYPE, floored
    to micro-units — the shared probability assembly of every KN
    consumer. All joins are keyed over the type frame; the |langs|-row
    discount/total sides ride broadcasts."""
    d3 = _count_of_counts(t["tri"], "c3").select(
        "lang", _discount(F.col("n1"), F.col("n2")).alias("dd3")
    )
    d2 = _count_of_counts(t["cont"], "cnt").select(
        "lang", _discount(F.col("n1"), F.col("n2")).alias("dd2")
    )
    p1 = F.col("cont1") / F.col("tot1")
    p2 = (
        F.greatest(F.col("cnt") - F.col("dd2"), F.lit(0.0)) / F.col("mid2")
        + F.col("dd2") * F.col("ctx2") / F.col("mid2") * p1
    )
    p3 = (
        F.greatest(F.col("c3") - F.col("dd3"), F.lit(0.0)) / F.col("c12s")
        + F.col("dd3") * F.col("n1p12") / F.col("c12s") * p2
    )
    # the three |langs|-row sides (totals + both discounts) pre-join
    # into ONE broadcast: a broadcast build is a driver-scheduled job,
    # and the assembly paid three of them where one carries the same
    # nine columns (the lang sets are identical — all derive from tri)
    langside = t["tot"].join(d3, "lang").join(d2, "lang")
    # the (lang,w2,w3)/(lang,w2)/(lang,w3) sides PRE-MERGE into one
    # (lang,w2,w3)-keyed frame (r13, guide §2.3): the type frame — the
    # biggest frame in the assembly — now re-shuffles twice (c12 key,
    # merged key) instead of four times; the cont-sized merge inputs
    # are strictly smaller. Inner joins on total keys (every side
    # derives from tri, so every key matches) — row set and the p2/p3
    # expression inputs are unchanged, values bit-identical.
    merged = (
        t["cont"]
        .join(t["mid"], ["lang", "w2"])
        .join(t["c1"], ["lang", "w3"])
    )
    return (
        t["tri"]
        .join(t["c12"], ["lang", "w1", "w2"])
        .join(merged, ["lang", "w2", "w3"])
        .join(F.broadcast(langside), "lang")
        .select(
            "lang",
            "w1",
            "w2",
            "w3",
            F.floor(-F.log(p3) * 1_000_000).cast("long").alias("term_u"),
        )
    )


def _discount(n1: F.Column, n2: F.Column) -> F.Column:
    """D = n1/(n1+2n2); fixed-shape long/long -> double divide (exact
    inputs, one correctly-rounded op — bit-identical cross-engine)."""
    return F.when(
        n1 + 2 * n2 == 0, F.lit(KN_DISCOUNT_FALLBACK)
    ).otherwise(n1 / (n1 + 2 * n2))


def _count_of_counts(typed: DataFrame, count_col: str) -> DataFrame:
    return typed.groupBy("lang").agg(
        F.count("*").cast("long").alias("n_types"),
        F.sum(F.when(F.col(count_col) == 1, 1).otherwise(0))
        .cast("long")
        .alias("n1"),
        F.sum(F.when(F.col(count_col) == 2, 1).otherwise(0))
        .cast("long")
        .alias("n2"),
    )


def kn_discount_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language Kneser-Ney count-of-count table and absolute
    discount for each model order (3 = raw trigram counts, 2 =
    continuation counts): lang, ord, n_types, n1, n2, discount. The
    table a KenLM-style trainer materializes first — and the fastest
    corpus-health readout there is: a collapsing n1/n_types ratio
    means the corpus is saturating (few novel trigrams), a discount
    near 1 means almost everything is a singleton (OCR noise / random
    text).

    100 TB shape: everything folds from the distinct-trigram-type
    frame (corpus-sublinear); the output is 2·|langs| rows."""
    t = _kn_tables(load_table_spread(spark, "documents", sf_dir, "doc_id"))
    d3 = _count_of_counts(t["tri"], "c3").select(
        "lang", F.lit(3).cast("int").alias("ord"), "n_types", "n1", "n2"
    )
    d2 = _count_of_counts(t["cont"], "cnt").select(
        "lang", F.lit(2).cast("int").alias("ord"), "n_types", "n1", "n2"
    )
    return (
        d3.unionByName(d2)
        .select(
            "lang",
            "ord",
            "n_types",
            "n1",
            "n2",
            TX.round_half_up(_discount(F.col("n1"), F.col("n2")), 6).alias(
                "discount"
            ),
        )
        .orderBy("lang", "ord")
    )


def kn_perplexity_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interpolated Kneser-Ney trigram cross-entropy / perplexity per
    (lang, source) — the CCNet-style LM quality monitor: a source whose
    perplexity under its language's own corpus LM spikes is shipping
    out-of-domain or machine-mangled text; one far BELOW the language's
    band is templated/repetitive. Columns: lang, source, n_docs,
    n_trigrams, cross_entropy (nats/trigram), ppl = e^H.

    CROSS-ENGINE DETERMINISM: all tables are exact integer counts;
    P_KN per trigram TYPE is one fixed-shape IEEE expression over
    them; -ln(P) is floored to micro-units at the TYPE grain, then the
    per-(lang, source) total is an exact integer sum of m·term_u
    (DECIMAL(38,0) — order-independent) with one final divide.

    100 TB shape: one corpus-scale shuffle builds the (lang, source,
    trigram) occurrence frame; every further table is bounded by
    distinct trigram types. The probability assembly joins on
    (lang,w1,w2) / (lang,w2,w3) / (lang,w2) / (lang,w3) — all
    hash-distributed on real key prefixes, never a single-task window —
    and the |langs|-row discount/total tables ride broadcasts. Scoring
    re-joins the type table at the (lang, source, type) grain
    (≤ |sources| × |types|), then folds to |langs|·|sources| rows."""
    t = _kn_tables(load_table_spread(spark, "documents", sf_dir, "doc_id"))
    types = _kn_type_terms(t)
    scored = t["occ"].join(types, ["lang", "w1", "w2", "w3"])
    agg = scored.groupBy("lang", "source").agg(
        F.sum("m").cast("long").alias("n_trigrams"),
        F.sum((F.col("m") * F.col("term_u")).cast("decimal(38,0)")).alias(
            "nll_u"
        ),
    )
    ce = F.col("nll_u").cast("double") / 1_000_000.0 / F.col("n_trigrams")
    return (
        agg.join(t["n_docs"], ["lang", "source"])
        .select(
            "lang",
            "source",
            "n_docs",
            "n_trigrams",
            TX.round_half_up(ce, 6).alias("cross_entropy"),
            TX.round_half_up(F.exp(ce), 4).alias("ppl"),
        )
        .orderBy("lang", "source")
    )


def kn_perplexity_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The CCNet head/middle/tail split: per-document KN cross-entropy,
    cut at per-language TERCILES — head = the most-fluent third
    (lowest perplexity), tail = the third that CCNet-style pipelines
    drop or downsample. Per (lang, bucket): n_docs, n_trigrams, pooled
    cross_entropy, ppl, and the tercile boundary the bucket closed at
    (ce_hi_micro; NULL for tail). This is the operator form of the
    actual CCNet mechanism (Wenzek et al. 2020 split their corpus by
    Wikipedia-LM perplexity terciles per language).

    CROSS-ENGINE DETERMINISM: per-doc score = exact integer floor
    division nll_u div n_tri (micro-nats; Spark `div` and DuckDB `//`
    agree on non-negative operands), tercile boundaries from exact
    cumulative counts (3·cum >= n / 3·cum >= 2n — no float quantile
    anywhere), pooled stats exact integer sums.

    100 TB shape: the per-doc scoring join is keyed on (lang, trigram)
    like the report; the tercile machinery runs on the VALUE HISTOGRAM
    (distinct micro-score values per lang — bounded by the micro-grid
    range, ~5·10⁷ worst case, CONSTANT in corpus size — the
    streaming-spearman rank discipline), so the per-lang window sorts
    the histogram, never the corpus; boundaries re-enter via a
    |langs|-row broadcast."""
    from pyspark.sql import Window

    # SINGLE corpus explode (r12): the split scores at the (lang, doc,
    # trigram) grain, so the per-doc counts are the base aggregation
    # and the type frame FOLDS from them — _kn_tables' occ table (the
    # (lang, source, trigram) grain) would be a second full corpus
    # explode + shuffle that nothing here consumes. Same tri values
    # either way: both grains sum to the per-(lang, trigram) total.
    docs = load_table_spread(spark, "documents", sf_dir, "doc_id")
    _toks, trg = _kn_trigram_frame(docs)
    docc = materialize(
        trg.groupBy("lang", "doc_id", "w1", "w2", "w3").agg(
            F.count("*").cast("long").alias("m")
        )
    )
    tri = materialize(
        docc.groupBy("lang", "w1", "w2", "w3").agg(
            F.sum("m").cast("long").alias("c3")
        )
    )
    t = {"tri": tri}
    t.update(_kn_derived_from_tri(tri))
    types = _kn_type_terms(t)
    # MATERIALIZED: per_doc feeds BOTH the tercile histogram and the
    # bucket tagging — without the cut the whole scoring pyramid (the
    # corpus re-explode, the five-table probability assembly, the
    # per-doc fold) executes twice (measured: 132 Exchange nodes in the
    # sf0.1 plan, the worst in the repo; the cut halves the plan).
    per_doc = materialize(
        docc.join(types, ["lang", "w1", "w2", "w3"])
        .groupBy("lang", "doc_id")
        .agg(
            F.sum("m").cast("long").alias("n_tri"),
            F.sum((F.col("m") * F.col("term_u")).cast("decimal(38,0)"))
            .cast("long")
            .alias("nll_u"),
        )
        .withColumn("ce_u", F.expr("nll_u div n_tri"))
    )
    hist = per_doc.groupBy("lang", "ce_u").agg(
        F.count("*").cast("long").alias("c")
    )
    w = (
        Window.partitionBy("lang")
        .orderBy("ce_u")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # per-lang doc total as a second window over the SAME bounded
    # histogram partition (Σc = n_docs of the lang) — replaces a
    # separate per_doc aggregate + broadcast join, whose broadcast
    # build was one more driver-scheduled job re-reading per_doc
    cum = hist.withColumn("cum", F.sum("c").over(w)).withColumn(
        "n", F.sum("c").over(Window.partitionBy("lang"))
    )
    bounds = cum.groupBy("lang").agg(
        F.min(F.when(3 * F.col("cum") >= F.col("n"), F.col("ce_u"))).alias(
            "t1"
        ),
        F.min(
            F.when(3 * F.col("cum") >= 2 * F.col("n"), F.col("ce_u"))
        ).alias("t2"),
    )
    bucket = (
        F.when(F.col("ce_u") <= F.col("t1"), F.lit("head"))
        .when(F.col("ce_u") <= F.col("t2"), F.lit("middle"))
        .otherwise(F.lit("tail"))
    )
    tagged = per_doc.join(F.broadcast(bounds), "lang").select(
        "lang", "n_tri", "nll_u", bucket.alias("bucket"), "t1", "t2"
    )
    agg = tagged.groupBy("lang", "bucket").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("n_tri").cast("long").alias("n_trigrams"),
        F.sum(F.col("nll_u").cast("decimal(38,0)")).alias("nll_u"),
        F.max(
            F.when(F.col("bucket") == "head", F.col("t1")).when(
                F.col("bucket") == "middle", F.col("t2")
            )
        ).alias("ce_hi_micro"),
    )
    ce = F.col("nll_u").cast("double") / 1_000_000.0 / F.col("n_trigrams")
    return agg.select(
        "lang",
        "bucket",
        "n_docs",
        "n_trigrams",
        TX.round_half_up(ce, 6).alias("cross_entropy"),
        TX.round_half_up(F.exp(ce), 4).alias("ppl"),
        "ce_hi_micro",
    ).orderBy("lang", "bucket")


# ---------------------------------------------------------------------------
# Distilled logistic-regression quality classifier
# ---------------------------------------------------------------------------
# Full-batch gradient descent, LR_ROUNDS rounds, on six features in
# exact micro-units, distilling the rule-based quality_score keep/drop
# verdict into a linear model (exactly how public pipelines bootstrap
# quality classifiers from weak heuristic labels). The link is the
# hash-provable "algebraic sigmoid" sigma(m) = 0.5 + 0.5·s/(1+|s|),
# s = m/2 — a strictly monotone (0,1) squashing computed with FOUR
# IEEE ops (no exp in the training path), so every engine reproduces
# the trajectory bit-for-bit. Documented as a fixed-point logistic
# variant: the GD update uses (sigma(w·x) - y)·x, the textbook
# logistic gradient shape with sigma swapped for its algebraic twin.

#: GD rounds / numerator of the learning rate (eta = LR_ETA_NUM / n,
#: applied to the SUM gradient — i.e. eta·mean-gradient per round).
#: Shared with the generated oracle CTE chain.
LR_ROUNDS = 8
LR_ETA_NUM = 4
LR_N_FEATURES = 6  # bias + 5 signals

#: Deterministic holdout fraction for quality_lr_holdout_eval: a doc
#: is held out when its seeded md5 fraction u(doc_id) < this value.
LR_HOLDOUT_FRAC = 0.2

#: Label threshold distilled from quality_score (operators/text.py) —
#: keep = quality >= 0.6, the reference pipeline's gate.
LR_LABEL_THRESHOLD = 0.6

#: The oracle's stopword IN-list is GENERATED from the same
#: TX.STOPWORDS literal the Spark expressions use (the T.EDIT_WINDOW
#: generation discipline, r10 advice — shared constants, never
#: parallel literals that can drift).
_SQL_STOPWORDS = ",".join(f"'{w}'" for w in TX.STOPWORDS)


def _lr_features(docs: DataFrame) -> DataFrame:
    """(doc_id, y, x0_u..x5_u): weak label + micro-unit features. Pure
    narrow projection — embarrassingly parallel; the quality_score
    expressions are inlined so label and features come from ONE pass
    over text."""
    text = F.col("text")
    toks = TX.tokens(text)
    n_toks = F.size(toks)
    n_stop = F.size(
        F.filter(toks, lambda t: t.isin(*TX.STOPWORDS))
    )
    punct_len = F.length(F.regexp_replace(text, r"[A-Za-z0-9\s]", ""))
    nonspace = F.length(F.regexp_replace(F.trim(text), r"\s", ""))
    digits = F.length(F.regexp_replace(text, r"[^0-9]", ""))
    # the quality_score composite (operators/text.py:359) inlined for
    # the weak label
    len_score = F.least(n_toks / 50.0, F.lit(1.0))
    punct = punct_len / F.length(text)
    stop_score = F.least(n_stop / n_toks * 4.0, F.lit(1.0))
    quality = TX.round_half_up(
        0.4 * len_score + 0.3 * (1.0 - punct) + 0.3 * stop_score, 3
    )
    return docs.filter(F.length(text) > 0).filter(n_toks >= 1).select(
        "doc_id",
        (quality >= LR_LABEL_THRESHOLD).cast("int").alias("y"),
        F.lit(1_000_000).cast("long").alias("x0_u"),
        F.floor(F.least(n_toks.cast("long"), F.lit(100)) * 1_000_000.0 / 100)
        .cast("long")
        .alias("x1_u"),
        F.floor(n_stop * 1_000_000.0 / n_toks).cast("long").alias("x2_u"),
        F.floor(punct_len * 1_000_000.0 / F.length(text))
        .cast("long")
        .alias("x3_u"),
        F.floor(
            F.least(nonspace * 1.0 / n_toks, F.lit(10.0)) * 1_000_000.0 / 10
        )
        .cast("long")
        .alias("x4_u"),
        F.floor(digits * 1_000_000.0 / F.length(text))
        .cast("long")
        .alias("x5_u"),
    )


def _sigma_err_loss(w_u: list[int]) -> tuple[F.Column, F.Column]:
    """(err, loss_u) columns at the given micro-unit weight literals.
    Margin = exact long dot product over micro features divided ONCE;
    sigma is the 4-op algebraic squashing; loss is the logistic loss at
    sigma, floored to micro-units per row."""
    dot = None
    for j, w in enumerate(w_u):
        term = F.lit(int(w)) * F.col(f"x{j}_u")
        dot = term if dot is None else dot + term
    m = dot / 1_000_000_000_000.0
    s = m * 0.5
    sigma = F.lit(0.5) + F.lit(0.5) * (s / (1 + F.abs(s)))
    err = sigma - F.col("y")
    loss = F.when(F.col("y") == 1, -F.log(sigma)).otherwise(
        -F.log(1 - sigma)
    )
    loss_u = F.floor(loss * 1_000_000).cast("long")
    return err, loss_u


def _lr_round_agg(feats: DataFrame, w_u: list[int]) -> tuple[list[int], int, int]:
    """One full-batch pass at weights w_u: (gradient sums G_j in
    floored err·x_u units, loss_u sum, n). The ONLY values crossing
    the driver boundary are 8 integers — this is the micro-Lloyd
    iterative pattern, not a data collect."""
    err, loss_u = _sigma_err_loss(w_u)
    aggs = [
        F.sum(F.floor(err * F.col(f"x{j}_u")).cast("decimal(38,0)")).alias(
            f"g{j}"
        )
        for j in range(len(w_u))
    ]
    aggs.append(F.sum(loss_u.cast("decimal(38,0)")).alias("loss_u"))
    aggs.append(F.count("*").cast("long").alias("n"))
    row = feats.agg(*aggs).first()
    g = [int(row[f"g{j}"]) for j in range(len(w_u))]
    return g, int(row["loss_u"]), int(row["n"])


def _lr_train_rows(
    feats: DataFrame,
) -> list[tuple[int, list[int], float]]:
    """The unrolled GD trajectory: [(round, w_u, mean_loss)] for round
    0..LR_ROUNDS, loss evaluated AT that round's weights. Updates are
    exact integer floor division (Python `//` == floor; the oracle
    emulates floor-div since DuckDB's `//` truncates toward zero)."""
    w_u = [0] * LR_N_FEATURES
    out: list[tuple[int, list[int], float]] = []
    for k in range(LR_ROUNDS + 1):
        g, loss_u, n = _lr_round_agg(feats, w_u)
        mean_loss = (loss_u / 1_000_000.0) / n
        out.append((k, list(w_u), mean_loss))
        if k < LR_ROUNDS:
            w_u = [
                w_u[j] - (LR_ETA_NUM * g[j]) // n
                for j in range(LR_N_FEATURES)
            ]
    return out


def _lr_feats_materialized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The shared materialized feature frame. The `rebalance` hint lets
    AQE size the retained frame's partitions by BYTES (advisory size)
    instead of inheriting the spread scan's core-count partitioning:
    the 7-long-column frame is consumed by LR_ROUNDS+1 sequential
    aggregate passes, so right-sizing it once beats paying
    core-count near-empty tasks on every pass (locally 32 tasks of
    ~60 rows each; at scale AQE picks however many advisory-sized
    partitions the corpus needs — the scale-adaptive form of guide
    §2.2's 'fewer, larger partitions')."""
    return materialize(
        _lr_features(
            load_table_spread(spark, "documents", sf_dir, "doc_id")
        ).hint("rebalance")
    )


def quality_lr_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train the distilled quality classifier: LR_ROUNDS full-batch GD
    rounds over the corpus, one output row per round — (round,
    w0_u..w5_u micro-unit weights, train_loss at those weights). The
    trajectory itself is the deliverable: a training-data platform
    retrains this nightly and diffs the weight path to catch feature
    drift (a weight that flips sign means a signal reversed meaning in
    the intake mix).

    100 TB shape: LR_ROUNDS+1 passes over a six-long-column narrow
    projection (cache-friendly; each pass is one map-side-combinable
    aggregate producing EIGHT integers on the driver — the micro-Lloyd
    loop shape, no data-scale collect)."""
    feats = _lr_feats_materialized(spark, sf_dir)
    # the shared floor(x*1e6+0.5)/1e6 rounding, applied ONCE to the raw
    # mean loss (double-rounding through round() first would desync the
    # oracle one ulp from a .5 boundary)
    rows = [
        (
            k,
            *[int(w) for w in w_u],
            math.floor(loss * 1_000_000 + 0.5) / 1_000_000,
        )
        for k, w_u, loss in _lr_train_rows(feats)
    ]
    schema = (
        "step int, w0_u long, w1_u long, w2_u long, w3_u long,"
        " w4_u long, w5_u long, train_loss double"
    )
    return spark.createDataFrame(rows, schema).orderBy("step")


def _lr_final_weights(feats: DataFrame) -> list[int]:
    return _lr_train_rows(feats)[-1][1]


def quality_lr_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Score every document under the trained classifier: doc_id,
    score = sigma(w·x) (6dp), pred (score >= 0.5), y_weak (the
    rule-based label it distilled). The per-doc inference pass of the
    model-based quality filter — disagreements (pred != y_weak) are
    exactly the docs worth human review, because the linear model
    generalizes the rules it was taught.

    100 TB shape: training cost as quality_lr_train; inference is a
    pure narrow projection with the weights inlined as literals."""
    feats = _lr_feats_materialized(spark, sf_dir)
    w_u = _lr_final_weights(feats)
    dot = None
    for j, w in enumerate(w_u):
        term = F.lit(int(w)) * F.col(f"x{j}_u")
        dot = term if dot is None else dot + term
    m = dot / 1_000_000_000_000.0
    s = m * 0.5
    sigma = F.lit(0.5) + F.lit(0.5) * (s / (1 + F.abs(s)))
    return feats.select(
        "doc_id",
        TX.round_half_up(sigma, 6).alias("score"),
        (sigma >= 0.5).cast("int").alias("pred"),
        F.col("y").alias("y_weak"),
    ).orderBy("doc_id")


def quality_lr_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reliability table of the trained classifier: decile bins of the
    predicted score vs the empirical weak-label rate — per bin: n,
    mean_score (6dp), pos_rate (6dp). The calibration read a filter
    operator needs before its scores become sampling WEIGHTS (a
    miscalibrated filter silently reweights the corpus).

    100 TB shape: the score projection plus ONE 10-bucket aggregate."""
    scored = quality_lr_score(spark, sf_dir)
    b = F.least(F.floor(F.col("score") * 10), F.lit(9)).cast("int")
    # mean_score folds exactly: score is already 6dp-rounded, so the
    # micro-unit sum is an exact integer (order-independent)
    score_u = F.floor(F.col("score") * 1_000_000 + F.lit(0.5)).cast("long")
    return (
        scored.select(b.alias("bin"), score_u.alias("s_u"), "y_weak")
        .groupBy("bin")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum(F.col("s_u").cast("decimal(38,0)")).alias("s_sum"),
            F.sum(F.col("y_weak").cast("long")).alias("n_pos"),
        )
        .select(
            "bin",
            "n",
            TX.round_half_up(
                F.col("s_sum").cast("double") / 1_000_000.0 / F.col("n"), 6
            ).alias("mean_score"),
            TX.round_half_up(F.col("n_pos") / F.col("n"), 6).alias(
                "pos_rate"
            ),
        )
        .orderBy("bin")
    )


def _lr_holdout_u() -> F.Column:
    """Seeded md5 fraction u(doc_id) in [0,1) — the deterministic
    train/holdout split coin, replayed identically by the oracle."""
    return (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("qlr-"), F.col("doc_id").cast("string"))),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        / F.lit(4294967296.0)
    )


def quality_lr_holdout_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The evaluation stage the distilled classifier needs before its
    scores gate real data: train on the ~80% md5-split, score the
    held-out ~20%, report the confusion counts and
    accuracy/precision/recall/F1 against the weak labels. One row:
    n_train, n_test, tp, fp, fn, tn, accuracy, precision, recall, f1.
    A holdout F1 far below the train agreement means the linear model
    memorized the rule thresholds instead of generalizing them.

    CROSS-ENGINE DETERMINISM: the split coin is a seeded md5 fraction
    (same digest both engines); training replays the exact integer GD
    trajectory on the train subset; the confusion counts are exact
    integers and each metric is a guarded fixed-shape divide.

    100 TB shape: identical to quality_lr_train (the GD passes now
    scan the ~80% subset) plus one narrow scoring pass and a 1-row
    fold over the holdout."""
    feats = materialize(
        _lr_features(load_table_spread(spark, "documents", sf_dir, "doc_id"))
        .withColumn("holdout", _lr_holdout_u() < LR_HOLDOUT_FRAC)
        .hint("rebalance")  # byte-sized retained frame; see _lr_feats_materialized
    )
    train = feats.filter(~F.col("holdout"))
    test = feats.filter(F.col("holdout"))
    w_u = _lr_train_rows(train)[-1][1]
    dot = None
    for jj, w in enumerate(w_u):
        term = F.lit(int(w)) * F.col(f"x{jj}_u")
        dot = term if dot is None else dot + term
    m = dot / 1_000_000_000_000.0
    s_ = m * 0.5
    sigma = F.lit(0.5) + F.lit(0.5) * (s_ / (1 + F.abs(s_)))
    pred = (sigma >= 0.5).cast("int")
    conf = test.select(
        pred.alias("p"), F.col("y")
    ).agg(
        F.sum(((F.col("p") == 1) & (F.col("y") == 1)).cast("long")).alias("tp"),
        F.sum(((F.col("p") == 1) & (F.col("y") == 0)).cast("long")).alias("fp"),
        F.sum(((F.col("p") == 0) & (F.col("y") == 1)).cast("long")).alias("fn"),
        F.sum(((F.col("p") == 0) & (F.col("y") == 0)).cast("long")).alias("tn"),
    )
    n_train = train.count()
    prec = F.when(
        F.col("tp") + F.col("fp") == 0, F.lit(0.0)
    ).otherwise(F.col("tp") / (F.col("tp") + F.col("fp")))
    rec = F.when(
        F.col("tp") + F.col("fn") == 0, F.lit(0.0)
    ).otherwise(F.col("tp") / (F.col("tp") + F.col("fn")))
    f1 = F.when(prec + rec == 0, F.lit(0.0)).otherwise(
        2 * prec * rec / (prec + rec)
    )
    n_test = F.col("tp") + F.col("fp") + F.col("fn") + F.col("tn")
    return conf.select(
        F.lit(int(n_train)).cast("long").alias("n_train"),
        n_test.cast("long").alias("n_test"),
        "tp",
        "fp",
        "fn",
        "tn",
        TX.round_half_up((F.col("tp") + F.col("tn")) / n_test, 6).alias(
            "accuracy"
        ),
        TX.round_half_up(prec, 6).alias("precision"),
        TX.round_half_up(rec, 6).alias("recall"),
        TX.round_half_up(f1, 6).alias("f1"),
    )


# ---------------------------------------------------------------------------
# DuckDB oracle generators (unrolled GD / static KN CTE chains)
# ---------------------------------------------------------------------------
# Generated from the SAME constants the operators use (LR_ROUNDS,
# LR_ETA_NUM, TX.STOPWORDS, KN_DISCOUNT_FALLBACK), so the harness can
# never desynchronize from the operator configuration (the
# _EDIT_LEAD_SELECTS discipline, r10 advice).

#: Shared feature CTE: weak label + micro-unit features, mirroring
#: _lr_features expression-for-expression (same op shapes, same
#: floor points).
_LR_FEATS_CTES = f"""qt AS (
    SELECT doc_id, text,
           string_split_regex(trim(text), '\\s+') AS toks,
           length(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g'))
             AS punct_len,
           length(regexp_replace(trim(text), '\\s', '', 'g')) AS nonspace,
           length(regexp_replace(text, '[^0-9]', '', 'g')) AS digits,
           len(list_filter(string_split_regex(trim(text), '\\s+'),
               x -> x IN ({_SQL_STOPWORDS}))) AS n_stop
    FROM documents WHERE length(text) > 0
), qq AS (
    SELECT doc_id, text, toks, punct_len, nonspace, digits, n_stop,
           floor((0.4 * least(len(toks) / 50.0, 1.0)
                  + 0.3 * (1.0 - punct_len * 1.0 / length(text))
                  + 0.3 * least(n_stop * 1.0 / len(toks) * 4.0, 1.0))
                 * 1000 + 0.5) / 1000 AS quality
    FROM qt WHERE len(toks) >= 1
), feats AS (
    SELECT doc_id,
           CAST(quality >= {LR_LABEL_THRESHOLD} AS INTEGER) AS y,
           CAST(1000000 AS BIGINT) AS x0_u,
           CAST(floor(least(len(toks), 100) * 1000000.0 / 100) AS BIGINT)
             AS x1_u,
           CAST(floor(n_stop * 1000000.0 / len(toks)) AS BIGINT) AS x2_u,
           CAST(floor(punct_len * 1000000.0 / length(text)) AS BIGINT)
             AS x3_u,
           CAST(floor(least(nonspace * 1.0 / len(toks), 10.0)
                      * 1000000.0 / 10) AS BIGINT) AS x4_u,
           CAST(floor(digits * 1000000.0 / length(text)) AS BIGINT)
             AS x5_u
    FROM qq
)"""


def _sql_sigma(wprefix: str = "") -> str:
    """sigma(w·x) with the identical op shape as _sigma_err_loss:
    exact BIGINT dot product, ONE divide, then the 4-op squashing."""
    dot = " + ".join(
        f"{wprefix}w{j} * x{j}_u" for j in range(LR_N_FEATURES)
    )
    m = f"(({dot}) / 1000000000000.0)"
    s = f"({m} * 0.5)"
    return f"(0.5 + 0.5 * ({s} / (1 + abs({s}))))"


def _lr_gd_ctes(src: str = "feats") -> str:
    """w_0..w_K and eval_0..eval_K CTEs: eval_k aggregates the floored
    gradient terms and loss at w_k; w_{k+1} applies exact FLOOR
    division (DuckDB's native // truncates toward zero, so the residue
    is removed first — (a - ((a%n)+n)%n) // n is floor for n>0
    regardless of sign, matching Python's //)."""
    zeros = ", ".join(
        f"CAST(0 AS BIGINT) AS w{j}" for j in range(LR_N_FEATURES)
    )
    parts = [f"w_0 AS (SELECT {zeros})"]
    sig = _sql_sigma()
    for k in range(LR_ROUNDS + 1):
        gsums = ", ".join(
            f"sum(CAST(floor(({sig} - y) * x{j}_u) AS BIGINT)) AS g{j}"
            for j in range(LR_N_FEATURES)
        )
        parts.append(
            f"""eval_{k} AS (
    SELECT {gsums},
           sum(CAST(floor((CASE WHEN y = 1 THEN -ln({sig})
                           ELSE -ln(1 - {sig}) END) * 1000000) AS BIGINT))
             AS loss_u,
           count(*) AS n
    FROM {src} CROSS JOIN w_{k}
)"""
        )
        if k < LR_ROUNDS:
            ups = ", ".join(
                f"CAST(w{j} - (({LR_ETA_NUM} * g{j}"
                f" - ((({LR_ETA_NUM} * g{j}) % n + n) % n)) // n)"
                f" AS BIGINT) AS w{j}"
                for j in range(LR_N_FEATURES)
            )
            parts.append(
                f"w_{k + 1} AS (SELECT {ups} FROM w_{k} CROSS JOIN eval_{k})"
            )
    return ",\n".join(parts)


def lr_train_oracle_sql() -> str:
    rounds = "\nUNION ALL\n".join(
        f"""SELECT {k} AS step, {', '.join(
            f'w{j} AS w{j}_u' for j in range(LR_N_FEATURES))},
           floor(((loss_u / 1000000.0) / n) * 1000000 + 0.5) / 1000000
             AS train_loss
    FROM w_{k} CROSS JOIN eval_{k}"""
        for k in range(LR_ROUNDS + 1)
    )
    return (
        f"WITH {_LR_FEATS_CTES},\n{_lr_gd_ctes()}\n"
        f"SELECT CAST(step AS INTEGER) AS step, "
        f"{', '.join(f'w{j}_u' for j in range(LR_N_FEATURES))}, train_loss "
        f"FROM ({rounds}) ORDER BY step"
    )


def lr_score_oracle_sql() -> str:
    sig = _sql_sigma()
    return (
        f"WITH {_LR_FEATS_CTES},\n{_lr_gd_ctes()}\n"
        f"SELECT doc_id, floor({sig} * 1000000 + 0.5) / 1000000 AS score, "
        f"CAST({sig} >= 0.5 AS INTEGER) AS pred, y AS y_weak "
        f"FROM feats CROSS JOIN w_{LR_ROUNDS} ORDER BY doc_id"
    )


def lr_calibration_oracle_sql() -> str:
    return (
        f"""WITH sc AS ({lr_score_oracle_sql()})
SELECT CAST(least(floor(score * 10), 9) AS INTEGER) AS bin,
       CAST(count(*) AS BIGINT) AS n,
       floor(((CAST(sum(CAST(floor(score * 1000000 + 0.5) AS BIGINT))
                    AS DOUBLE) / 1000000.0) / count(*)) * 1000000 + 0.5)
         / 1000000 AS mean_score,
       floor((CAST(sum(y_weak) AS BIGINT) / count(*)) * 1000000 + 0.5)
         / 1000000 AS pos_rate
FROM sc GROUP BY 1 ORDER BY bin"""
    )


#: Shared KN count-table CTE chain (trigram types and the continuation
#: hierarchy), mirroring _kn_tables table-for-table.
_KN_CTES = f"""t AS (
    SELECT doc_id, lang, source,
           string_split_regex(trim(text), '\\s+') AS toks
    FROM documents
), trg AS (
    SELECT lang, source, doc_id, g.w1 AS w1, g.w2 AS w2, g.w3 AS w3
    FROM (SELECT lang, source, doc_id,
                 unnest(list_transform(
                     generate_series(1, CAST(len(toks) AS INTEGER) - 2),
                     i -> struct_pack(w1 := toks[i], w2 := toks[i+1],
                                      w3 := toks[i+2]))) AS g
          FROM t WHERE len(toks) >= 3) x
), occ AS (
    SELECT lang, source, w1, w2, w3, CAST(count(*) AS BIGINT) AS m
    FROM trg GROUP BY 1, 2, 3, 4, 5
), tri AS (
    SELECT lang, w1, w2, w3, CAST(sum(m) AS BIGINT) AS c3
    FROM occ GROUP BY 1, 2, 3, 4
), c12 AS (
    SELECT lang, w1, w2, CAST(sum(c3) AS BIGINT) AS c12s,
           CAST(count(*) AS BIGINT) AS n1p12
    FROM tri GROUP BY 1, 2, 3
), cont AS (
    SELECT lang, w2, w3, CAST(count(*) AS BIGINT) AS cnt
    FROM tri GROUP BY 1, 2, 3
), mid AS (
    SELECT lang, w2, CAST(count(*) AS BIGINT) AS mid2,
           CAST(count(DISTINCT w3) AS BIGINT) AS ctx2
    FROM tri GROUP BY 1, 2
), c1 AS (
    SELECT lang, w3, CAST(count(*) AS BIGINT) AS cont1
    FROM cont GROUP BY 1, 2
), tot AS (
    SELECT lang, CAST(count(*) AS BIGINT) AS tot1 FROM cont GROUP BY 1
), coc3 AS (
    SELECT lang, CAST(count(*) AS BIGINT) AS n_types,
           CAST(sum(CASE WHEN c3 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
           CAST(sum(CASE WHEN c3 = 2 THEN 1 ELSE 0 END) AS BIGINT) AS n2
    FROM tri GROUP BY 1
), coc2 AS (
    SELECT lang, CAST(count(*) AS BIGINT) AS n_types,
           CAST(sum(CASE WHEN cnt = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
           CAST(sum(CASE WHEN cnt = 2 THEN 1 ELSE 0 END) AS BIGINT) AS n2
    FROM cont GROUP BY 1
), d3 AS (
    SELECT lang, CASE WHEN n1 + 2 * n2 = 0 THEN {KN_DISCOUNT_FALLBACK}
                 ELSE n1 / (n1 + 2 * n2) END AS dd3
    FROM coc3
), d2 AS (
    SELECT lang, CASE WHEN n1 + 2 * n2 = 0 THEN {KN_DISCOUNT_FALLBACK}
                 ELSE n1 / (n1 + 2 * n2) END AS dd2
    FROM coc2
)"""


def kn_discount_oracle_sql() -> str:
    arm = (
        f"CASE WHEN n1 + 2 * n2 = 0 THEN {KN_DISCOUNT_FALLBACK} "
        "ELSE n1 / (n1 + 2 * n2) END"
    )
    return f"""WITH {_KN_CTES}
SELECT lang, ord, n_types, n1, n2,
       floor(({arm}) * 1000000 + 0.5) / 1000000 AS discount
FROM (
    SELECT lang, CAST(3 AS INTEGER) AS ord, n_types, n1, n2 FROM coc3
    UNION ALL
    SELECT lang, CAST(2 AS INTEGER) AS ord, n_types, n1, n2 FROM coc2
) u ORDER BY lang, ord"""


def _kn_types_cte() -> str:
    """The shared `types` CTE: -ln P_KN per trigram type in micro
    units, mirroring _kn_type_terms expression-for-expression."""
    p1 = "(cont1 / tot1)"
    p2 = (
        "(greatest(cnt - dd2, 0.0) / mid2"
        f" + dd2 * ctx2 / mid2 * {p1})"
    )
    p3 = (
        "(greatest(c3 - dd3, 0.0) / c12s"
        f" + dd3 * n1p12 / c12s * {p2})"
    )
    return f"""types AS (
    SELECT tri.lang, w1, w2, w3,
           CAST(floor(-ln({p3}) * 1000000) AS BIGINT) AS term_u
    FROM tri
    JOIN c12 USING (lang, w1, w2)
    JOIN cont USING (lang, w2, w3)
    JOIN mid USING (lang, w2)
    JOIN c1 USING (lang, w3)
    JOIN tot USING (lang)
    JOIN d3 USING (lang)
    JOIN d2 USING (lang)
)"""


def kn_perplexity_oracle_sql() -> str:
    return f"""WITH {_KN_CTES}, {_kn_types_cte()}, agg AS (
    SELECT o.lang, o.source,
           CAST(sum(o.m) AS BIGINT) AS n_trigrams,
           sum(o.m * ty.term_u) AS nll_u
    FROM occ o JOIN types ty USING (lang, w1, w2, w3)
    GROUP BY 1, 2
), nd AS (
    SELECT lang, source, CAST(count(*) AS BIGINT) AS n_docs
    FROM t WHERE len(toks) >= 3 GROUP BY 1, 2
)
SELECT a.lang, a.source, nd.n_docs, a.n_trigrams,
       floor((CAST(nll_u AS DOUBLE) / 1000000.0 / n_trigrams)
             * 1000000 + 0.5) / 1000000 AS cross_entropy,
       floor(exp(CAST(nll_u AS DOUBLE) / 1000000.0 / n_trigrams)
             * 10000 + 0.5) / 10000 AS ppl
FROM agg a JOIN nd USING (lang, source)
ORDER BY lang, source"""


def kn_perplexity_split_oracle_sql() -> str:
    return f"""WITH {_KN_CTES}, {_kn_types_cte()}, docc AS (
    SELECT lang, doc_id, w1, w2, w3, CAST(count(*) AS BIGINT) AS m
    FROM trg GROUP BY 1, 2, 3, 4, 5
), per_doc AS (
    SELECT d.lang, d.doc_id, CAST(sum(d.m) AS BIGINT) AS n_tri,
           CAST(sum(d.m * ty.term_u) AS BIGINT) AS nll_u
    FROM docc d JOIN types ty USING (lang, w1, w2, w3)
    GROUP BY 1, 2
), pd AS (
    SELECT lang, doc_id, n_tri, nll_u, nll_u // n_tri AS ce_u
    FROM per_doc
), hist AS (
    SELECT lang, ce_u, CAST(count(*) AS BIGINT) AS c FROM pd GROUP BY 1, 2
), nl AS (
    SELECT lang, CAST(count(*) AS BIGINT) AS n FROM pd GROUP BY 1
), cum AS (
    SELECT lang, ce_u,
           sum(c) OVER (PARTITION BY lang ORDER BY ce_u) AS cum
    FROM hist
), bounds AS (
    SELECT c.lang,
           min(CASE WHEN 3 * cum >= n THEN ce_u END) AS t1,
           min(CASE WHEN 3 * cum >= 2 * n THEN ce_u END) AS t2
    FROM cum c JOIN nl USING (lang) GROUP BY 1
), tagged AS (
    SELECT p.lang, n_tri, nll_u,
           CASE WHEN ce_u <= t1 THEN 'head'
                WHEN ce_u <= t2 THEN 'middle'
                ELSE 'tail' END AS bucket,
           t1, t2
    FROM pd p JOIN bounds USING (lang)
), agg AS (
    SELECT lang, bucket, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_tri) AS BIGINT) AS n_trigrams,
           sum(nll_u) AS nll_u,
           max(CASE WHEN bucket = 'head' THEN t1
                    WHEN bucket = 'middle' THEN t2 END) AS ce_hi_micro
    FROM tagged GROUP BY 1, 2
)
SELECT lang, bucket, n_docs, n_trigrams,
       floor((CAST(nll_u AS DOUBLE) / 1000000.0 / n_trigrams)
             * 1000000 + 0.5) / 1000000 AS cross_entropy,
       floor(exp(CAST(nll_u AS DOUBLE) / 1000000.0 / n_trigrams)
             * 10000 + 0.5) / 10000 AS ppl,
       ce_hi_micro
FROM agg ORDER BY lang, bucket"""


def lr_holdout_eval_oracle_sql() -> str:
    sig = _sql_sigma()
    prec = "CASE WHEN tp + fp = 0 THEN 0.0 ELSE tp / (tp + fp) END"
    rec = "CASE WHEN tp + fn = 0 THEN 0.0 ELSE tp / (tp + fn) END"
    f1 = (
        f"CASE WHEN ({prec}) + ({rec}) = 0 THEN 0.0 "
        f"ELSE 2 * ({prec}) * ({rec}) / (({prec}) + ({rec})) END"
    )
    return (
        f"""WITH {_LR_FEATS_CTES}, split AS (
    SELECT *,
           (('0x' || substr(md5('qlr-' || CAST(doc_id AS VARCHAR)), 1, 8))
             ::BIGINT / 4294967296.0) < {LR_HOLDOUT_FRAC} AS holdout
    FROM feats
), trainfeats AS (
    SELECT * FROM split WHERE NOT holdout
), testfeats AS (
    SELECT * FROM split WHERE holdout
),
{_lr_gd_ctes("trainfeats")},
conf AS (
    SELECT
      CAST(sum(CASE WHEN {sig} >= 0.5 AND y = 1 THEN 1 ELSE 0 END)
           AS BIGINT) AS tp,
      CAST(sum(CASE WHEN {sig} >= 0.5 AND y = 0 THEN 1 ELSE 0 END)
           AS BIGINT) AS fp,
      CAST(sum(CASE WHEN NOT ({sig} >= 0.5) AND y = 1 THEN 1 ELSE 0 END)
           AS BIGINT) AS fn,
      CAST(sum(CASE WHEN NOT ({sig} >= 0.5) AND y = 0 THEN 1 ELSE 0 END)
           AS BIGINT) AS tn
    FROM testfeats CROSS JOIN w_{LR_ROUNDS}
)
SELECT
  (SELECT CAST(count(*) AS BIGINT) FROM trainfeats) AS n_train,
  CAST(tp + fp + fn + tn AS BIGINT) AS n_test,
  tp, fp, fn, tn,
  floor(((tp + tn) / (tp + fp + fn + tn)) * 1000000 + 0.5) / 1000000
    AS accuracy,
  floor(({prec}) * 1000000 + 0.5) / 1000000 AS "precision",
  floor(({rec}) * 1000000 + 0.5) / 1000000 AS recall,
  floor(({f1}) * 1000000 + 0.5) / 1000000 AS f1
FROM conf"""
    )
