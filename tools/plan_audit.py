"""Regenerate PLANS.md: captured `.explain("formatted")` excerpts for a
set of flagship queries, each annotated with what the plan MUST show
(pushed filters, broadcast sides, absence of cartesians/global sorts).
The same properties are locked as assertions in tests/test_plan_shapes.py;
this document is the human-readable audit trail.

Usage: python tools/plan_audit.py  (writes PLANS.md at the repo root)
"""

from __future__ import annotations

import io
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = "/root/testdata/sf0.01"

#: (registry name, what to verify in the plan — shown above the excerpt)
AUDITS = [
    (
        "pricing_summary",
        "Scan-level pushdown: the date filter lands in PushedFilters and "
        "ReadSchema carries only the 7 consumed columns of lineitem; the "
        "aggregation is two-phase (partial_ before the Exchange, then "
        "final) inside WholeStageCodegen.",
    ),
    (
        "join_revenue_by_nation",
        "Dimension joins broadcast: customer⋈nation⋈region resolve as "
        "BroadcastHashJoin (no shuffle on the fact side for the dims); "
        "only the fact aggregation exchanges.",
    ),
    (
        "neardup_pairs_lsh",
        "Near-dup candidates come from an EQUI-join on (band, band_key) — "
        "never a CartesianProduct. At sf0.01 AQE broadcasts the small "
        "side (BroadcastHashJoin below); at scale the same equi-join "
        "shuffles on the band keys. The exact-Jaccard verify touches "
        "candidates only.",
    ),
    (
        "range_join_concurrency",
        "Interval overlap planned as a bucket equi-join (bucket id in the "
        "join keys) rather than a BroadcastNestedLoopJoin over the raw "
        "inequality — the difference between O(n·buckets) and O(n²).",
    ),
    (
        "duplicate_spans",
        "Substring-dedup is candidate-scoped: the only corpus-wide "
        "exchange is the hash aggregate on the 16-byte gram; the join "
        "back returns duplicated windows only, and the island merge "
        "windows partition by doc_id (no global sort).",
    ),
    (
        "sq8_topk",
        "The SQ8 codebook collapses to a one-row broadcast (ObjectHashAggregate "
        "→ BroadcastExchange); corpus scoring is a narrow projection over "
        "it and top-k is TakeOrderedAndProject — no shuffle of scored rows.",
    ),
    (
        "bloom_decontaminate",
        "The Bloom filter blocks broadcast (BroadcastExchange on the "
        "4096-row aggregate); the corpus side tests bits in a narrow "
        "projection — the bloom arm never shuffles on gram.",
    ),
    (
        "curation_funnel_report",
        "The composed funnel still inherits its parts' shapes (banded LSH "
        "join, broadcast bench grams) and collapses to ONE final "
        "aggregation — stage counters are conditional sums in a single "
        "pass, not five scans.",
    ),
    (
        "ivfpq_topk",
        "The composed IVF×PQ pipeline: centroid probe is a broadcast "
        "left-semi join (only the n_probe clusters' rows survive), the "
        "PQ codebook and query each collapse to a one-row "
        "BroadcastExchange, PQ scoring is a narrow projection over the "
        "probed subset, and both shortlist and final rerank are "
        "TakeOrderedAndProject — zero shuffles after the (tiny) "
        "codebook build.",
    ),
    (
        "salted_epic_join",
        "Mega-epic skew mitigation (SURVEY §4.2): the shuffle keys are "
        "(epic_key, salt) — hashpartitioning carries BOTH, so the hot "
        "key's rows spread over SALT_BUCKETS partitions; the epic "
        "dimension replicates through Generate explode before its "
        "exchange; no BroadcastHashJoin hides the demonstration.",
    ),
    (
        "knn_join",
        "Batch exact k-NN: the query block broadcasts; the per-query "
        "rank filter plans as WindowGroupLimit(Partial) BEFORE the "
        "exchange — each map task forwards at most k rows per query, so "
        "the shuffle carries O(tasks·queries·k) rows, never the full "
        "scored cross product.",
    ),
    (
        "ivf_knn_join",
        "IVF-pruned batch k-NN: candidates come from a BroadcastHashJoin "
        "ON cluster_id against the tiny (query, probe-cluster) table — "
        "each query scores only its n_probe clusters' rows — then the "
        "same partial/final WindowGroupLimit pair bounds the top-k "
        "shuffle.",
    ),
    (
        "bm25_topk",
        "Retrieval discipline: tokens are filtered to the query terms "
        "BEFORE any aggregation (the explode feeds a Filter, so the "
        "(doc, term) shuffle carries only matching postings); df and the "
        "N/avgdl stats ride BroadcastExchanges; the per-doc length is a "
        "grouping key, never a join side; the final top-k is "
        "TakeOrderedAndProject.",
    ),
    (
        "dsir_importance_weights",
        "The trained model is bounded by the bucket count: the 1024-row "
        "histogram and the 1-row totals are the ONLY join sides, both "
        "BroadcastExchange — the corpus never shuffles on bucket; the "
        "only corpus-keyed exchange is the per-doc partial aggregation.",
    ),
    (
        "kmeans_assign",
        "Iterative trainer, Spark-shaped: the final assignment pass is "
        "ONE narrow map over the corpus with the centroid array riding a "
        "BroadcastNestedLoopJoin (single-row side); per training round "
        "the mean update exchanges only k x dims rows after partial "
        "aggregation. No SortMergeJoin, no cartesian anywhere.",
    ),
    (
        "containment_pairs",
        "Subset-dup candidates come from the df-capped inverted shingle "
        "index: an EQUI-join on the shingle (never all-pairs), with hot "
        "shingles dropped before the self-join so a boilerplate gram "
        "contributes zero candidates instead of df^2 pairs; the exact "
        "containment verify touches candidate pairs only.",
    ),
    (
        "allpairs_prefix_jaccard",
        "EXACT all-pairs similarity with prefix filtering: the prefix "
        "posting-list self-join is an EQUI join on the shingle (no "
        "cartesian / nested loop); the df table partial-aggs map-side; "
        "the exact-Jaccard verify is candidate-scoped (joins back onto "
        "the materialized sets frame, never the raw corpus).",
    ),
    (
        "chi2_keywords",
        "The (source, term) contingency frame is a two-phase aggregation "
        "(partial_count before its Exchange); the per-source totals, "
        "per-term document frequencies and the grand total all return "
        "as BroadcastExchanges; the top-k per source is a window over "
        "the tiny scored frame, partitioned BY SOURCE.",
    ),
    (
        "silhouette_report",
        "The all-centroid scoring pass rides a single-row broadcast "
        "centroid array (BroadcastNestedLoopJoin on a 1-row side) — the "
        "corpus is never shuffled after the scan; per training round "
        "the mean update exchanges only k x dims rows.",
    ),
    (
        "link_prediction_scores",
        "Wedge enumeration is an EQUI-join on the shared-neighbor key "
        "(SortMergeJoin/ShuffledHashJoin, never BroadcastNestedLoopJoin); "
        "the existing-edge exclusion is a left-anti join; the k rows come "
        "from TakeOrderedAndProject, not a global sort.",
    ),
    (
        "user_coactivity_pairs",
        "The bipartite self-join extracts the (hour, type) equi keys from "
        "the mixed condition (u < v rides as a post-join filter); hot "
        "buckets are removed by a left-semi against the capped bucket "
        "list BEFORE the join, so per-bucket work is bounded by CAP^2.",
    ),
    (
        "tfidf_cosine_pairs",
        "Candidates come from the df-capped postings join (equi on the "
        "gram key); the verify dot product joins weight vectors for "
        "candidate pairs only; norms aggregate once and join by doc key. "
        "All sums are integers — no float accumulation anywhere.",
    ),
    (
        "cusum_changepoints",
        "One (type, hour) partial aggregation, a BroadcastExchange of the "
        "|types|-row moment frame, and per-type ordered windows for the "
        "prefix sum and running min — no self-joins, no global windows.",
    ),
    (
        "value_equidepth_bins",
        "ONE exact-percentile aggregation broadcast as the edges array; "
        "assignment is a narrow per-row fold (no ntile window, no global "
        "sort); the final rollup is bins-bounded.",
    ),
    (
        "rendezvous_shards",
        "Pure projection: the candidate scores for all shards evaluate "
        "inside ONE array expression per row (no Generate/explode), the "
        "argmax is array_max — no Exchange besides the spread "
        "repartition, no aggregate, no join.",
    ),
    # -- r8 additions ------------------------------------------------------
    (
        "fuzzy_match_entities",
        "Record linkage stays block-local: the candidate join is an "
        "EQUI-join on the scale-aware right(name, 8) blocking key (r8 "
        "fix — the 4-char key space saturated and went quadratic at "
        "10x), levenshtein runs only inside blocks, and the best-match "
        "window partitions by import_id.",
    ),
    (
        "forecast_revenue_change",
        "Q6 is THE pushdown shape: ship-year range, discount band, and "
        "quantity cap ALL land in PushedFilters; no join anywhere; one "
        "two-phase integer-unit aggregation in WholeStageCodegen.",
    ),
    (
        "disjunctive_band_revenue",
        "Q19's OR-of-ANDs splits by CNF extraction: the quantity "
        "OR-bands reach the lineitem scan and the brand/size OR-bands "
        "reach the part scan; the pruned part dim broadcasts.",
    ),
    (
        "waiting_suppliers_report",
        "Q21's double-EXISTS is algebraized: one groupBy(orderkey, "
        "suppkey) partial, one per-order rollup join (orderkey "
        "partitioning reused), a broadcast supplier lookup, and "
        "TakeOrderedAndProject for the top-k — no correlated "
        "self-joins.",
    ),
    (
        "hybrid_rrf_topk",
        "Retrieval fusion composes the two ranker plans untouched "
        "(posting-scoped BM25 aggregation; broadcast-query cosine scan "
        "with TakeOrderedAndProject); the RRF join itself is over the "
        "tiny top pools — the corpus is never re-touched.",
    ),
    (
        "bottomk_quantile_sketch",
        "The bottom-k sample compiles to TakeOrderedAndProject "
        "(per-partition bottom-K, K-row merge) — NO global Sort+Exchange "
        "over orders; the grading pass is one scan joined against a "
        "broadcast 5-row estimate grid.",
    ),
    (
        "gap_fill_locf",
        "After the rewrite the only exchanges are observation-sized: the "
        "(user, hour) dedup and the user-key lead() window. The dense "
        "|users|x|hours| grid appears as a Generate (explode) in the "
        "FINAL projection — below every Exchange in the plan, so grid "
        "rows are produced, never shuffled.",
    ),
    (
        "theil_sen_trend",
        "Everything past the one day-key rollup Exchange runs on the "
        "|days|-row frame: the pairwise-slope join is a "
        "BroadcastNestedLoopJoin over two bounded day lists (calendar-"
        "bounded, never data-bounded), and the median windows sort "
        "|days|^2 slope rows, not orders.",
    ),
    (
        "token_js_divergence",
        "The corpus is touched once: a (source, tok) hash aggregate. The "
        "pair fan-out joins that vocab-bounded frame against a BROADCAST "
        "pair grid (BroadcastHashJoin/NestedLoop over |sources|^2 rows); "
        "the JSD term sum is a second bounded aggregate — no shuffle "
        "ever carries corpus-scale rows twice.",
    ),
    (
        "edit_distance_neardup",
        "Sorted-neighborhood with NO join at all: one (lang, band) "
        "window computes EDIT_WINDOW lead() neighbor columns, a "
        "generator explodes them, levenshtein runs on exactly N*W "
        "candidate rows. No CartesianProduct, no self-join — the r10 "
        "probe measured the unwindowed block join at 61x on 10x data; "
        "this form probes 3.6x.",
    ),
    (
        "event_association_rules",
        "One distinct (user, type) projection feeds a user-keyed self-"
        "join (per-user fanout bounded by |types|^2); the |types|-row "
        "support table and the 1-row user total enter as "
        "BroadcastExchange — the only corpus-scale shuffle is the "
        "distinct.",
    ),
    (
        "repeated_substring_report",
        "The gram index explodes once (corpus-chars mass) into a gram-"
        "keyed aggregate; the self-join runs ONLY on grams that passed "
        "the (distinct-doc <= 16, occurrences <= 64) boilerplate caps, "
        "so per-gram candidate fanout is <= 64^2 by construction — no "
        "CartesianProduct, no suffix sort; the diagonal-island window "
        "partitions by (pair, diag) over candidate mass only.",
    ),
    (
        "wasserstein_drift_report",
        "The scan projects only (source, n_chars) — text never leaves "
        "parquet; everything past the count agg runs on the |distinct "
        "lengths| x |sources| grid, with the W1 area terms summed in "
        "decimal(38,0) and one IEEE division per source.",
    ),
    (
        "bigram_entropy_rate",
        "One explode + (lang, a, b) hash aggregate is the only corpus-"
        "scale stage; the marginals are distributed groupBy aggregates "
        "joined back over the vocab^2-bounded distinct-bigram frame "
        "(the |langs|-row total via broadcast) — NO Window: a "
        "partitionBy(lang) window would sort a whole language's bigram "
        "vocabulary in one task (r11 What's-wrong #3).",
    ),
    (
        "kn_perplexity_report",
        "Interpolated KN trigram LM: ONE corpus-scale explode feeds a "
        "materialized (lang,source,trigram) occurrence frame; all seven "
        "count tables and the probability assembly are keyed joins over "
        "the distinct-trigram-type frame (|langs|-row discount/total "
        "sides broadcast) — no CartesianProduct, no Window, and the "
        "documents scan reads only (doc_id, lang, source, text).",
    ),
    (
        "quality_lr_score",
        "Classifier inference after the 8-round integer-GD train loop "
        "(which moves only EIGHT integers per round through the "
        "driver): a pure narrow projection over the materialized "
        "feature frame with the trained weights inlined as literals — "
        "no join, no window, no aggregation in the scoring path.",
    ),
    (
        "rbo_ranking_agreement",
        "Both rankers compile to their posting-scoped top-k plans "
        "(TakeOrderedAndProject); the agreement math joins two <= k-row "
        "lists against a broadcast k-row weight grid — nothing past the "
        "rankers scales with the corpus.",
    ),
]

MAX_LINES = 58


def _trim(plan: str) -> str:
    """Keep the physical-plan section up to MAX_LINES lines; elide the
    field-detail tail (the numbered operator breakdown) beyond it."""
    lines = [ln.rstrip() for ln in plan.splitlines() if ln.strip()]
    out, n = [], 0
    for ln in lines:
        out.append(ln)
        n += 1
        if n >= MAX_LINES:
            out.append("   ... (full operator detail elided; regenerate "
                       "with tools/plan_audit.py)")
            break
    return "\n".join(out)


def main() -> None:
    import __spark_entry__ as E
    from jira_cdc_git_spark.session import get_spark

    spark = get_spark(app_name="plan_audit", cpus=8)
    qs = E.queries()
    buf = io.StringIO()
    buf.write(
        "# PLANS — physical-plan audit of flagship queries\n\n"
        "Generated by `tools/plan_audit.py` (re-run it after changing an "
        "operator). Each section states the property the plan must "
        "exhibit at 100 TB, then the captured `explain(\"formatted\")` "
        "excerpt at sf0.01. The same properties are LOCKED as assertions "
        "in `tests/test_plan_shapes.py` — this file is the readable "
        "audit, the tests are the gate.\n"
    )
    for name, claim in AUDITS:
        df = qs[name](spark, SF_DIR)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        # strip the parquet path noise so the doc diffs stay stable
        plan = re.sub(r"file:[^\s\]]*", "file:...", plan)
        buf.write(f"\n## {name}\n\n{claim}\n\n```\n{_trim(plan)}\n```\n")
    with open(os.path.join(REPO, "PLANS.md"), "w") as fh:
        fh.write(buf.getvalue())
    print("wrote PLANS.md")


if __name__ == "__main__":
    main()
