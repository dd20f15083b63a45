"""Empty-input hardening: every pipeline operator must return an empty
result (not crash) when its source table has zero rows — the partition-
without-data case every real 100 TB run hits."""

import pytest
from pyspark.sql import functions as F

from jira_cdc_git_spark.operators import graph as GR
from jira_cdc_git_spark.operators import text as T
from jira_cdc_git_spark.operators import vectors as V
from jira_cdc_git_spark.sources.registry import load_table


@pytest.fixture(scope="module")
def empty_sf_dir(spark, sf_dir, tmp_path_factory):
    root = tmp_path_factory.mktemp("empty_sf")
    for name in ("documents", "embeddings"):
        df = load_table(spark, name, sf_dir)
        df.filter(F.lit(False)).write.parquet(str(root / f"{name}.parquet"))
    return str(root)


@pytest.mark.parametrize(
    "fn",
    [
        T.token_stats,
        T.quality_score,
        T.lang_id,
        T.bpe_token_estimate,
        T.doc_fingerprints,
        T.neardup_pairs_lsh,
        T.ngram_jaccard_pairs,
        T.winnow_fingerprints,
        T.simhash_signatures,
        T.simhash_neardup_pairs,
        T.bigram_surprisal,
        T.tfidf_topk,
        T.kmv_distinct_estimate,
        T.dataset_splits,
        T.repetition_metrics,
        T.boilerplate_ngrams,
        T.decontaminate,
        T.pii_scrub,
        T.stratified_sample,
        T.token_examples_salted,
        T.corpus_shards,
        T.gopher_quality_filters,
        T.perplexity_buckets,
        T.source_cap_sample,
        T.token_budget_sample,
        T.pmi_topk,
        T.minhash_accuracy_report,
        T.duplicate_spans,
        T.strip_duplicate_spans,
        T.bloom_decontaminate,
        T.domain_mixture_weights,
        T.mixture_resample,
        T.bpe_train_merges,
        T.bpe_subword_train_merges,
        T.bpe_subword_encode,
        T.bpe_vocab,
        T.bm25_topk,
        T.keyword_search,
        T.dsir_importance_weights,
        T.dsir_resample,
        T.ngram_novelty_report,
        T.shard_drift_report,
        T.containment_pairs,
        T.heavy_hitters_cms,
        T.neyman_stratified_sample,
        T.zipf_fit_report,
        T.overlap_chunks,
        T.quality_calibration_report,
        T.phrase_search,
        T.chi2_keywords,
        T.char_entropy_report,
        T.bbit_minhash_report,
        T.cross_split_leakage,
        T.corpus_snapshot_diff,
        T.rendezvous_shards,
        T.curriculum_order,
        T.weighted_sample_topk,
        T.allpairs_prefix_jaccard,
        T.proximity_search,
        T.quantile_normalize_scores,
        GR.kcore_decomposition,
        T.langid_confusion,
        V.kmeans_assign,
        V.kmeans_cluster_report,
        V.embedding_neardup,
        V.semdedup,
        V.sq8_topk,
        V.pq_topk,
        V.pq_rerank_topk,
        V.ivfpq_topk,
        V.silhouette_report,
        V.label_centroid_similarity,
        # r6 document/embedding-driven additions
        T.hapax_report,
        T.vocabulary_growth,
        T.stopword_discovery,
        T.tfidf_cosine_pairs,
        T.idf_drift_report,
        GR.textrank_keywords,
        lambda spark, d: V.matryoshka_topk(spark, d, dims=16),
        V.binary_hamming_topk,
        # r8 additions
        T.readability_report,
        T.source_lang_entropy,
        V.embedding_dim_variance_report,
        T.kmv_accuracy_report,
        T.dataset_card_report,
        V.hybrid_rrf_topk,
        # r9 wave-2 additions
        T.vocab_richness_report,
        T.lsh_scurve_calibration,
        GR.cluster_canonical_selection,
        # r9 wave-3/4 documents-table additions
        T.rocchio_expanded_topk,
        T.token_js_divergence,
        T.source_shingle_overlap,
        T.lm_dirichlet_topk,
    ],
)
def test_operator_empty_input_yields_empty_output(fn, spark, empty_sf_dir):
    assert fn(spark, empty_sf_dir).count() == 0


def test_topk_empty_corpus(spark, empty_sf_dir):
    # no query vector exists either — result must be empty, not an error
    assert V.cosine_topk(spark, empty_sf_dir).count() == 0
