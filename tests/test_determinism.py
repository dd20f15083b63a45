"""Determinism meta-tests: run twice, byte-identical results.

Every oracle comparison implicitly checks determinism against DuckDB, but
only at sf0.01 and only for queries WITH oracles. This runs the
stochastic-risk pipelines (hash families, LSH banding, sampling, iterative
training) twice in one session and requires identical output — the class
of bug where a mis-bound lambda or an unstable sort silently varies between
runs while each run still "looks right".
"""

import pytest

import __spark_entry__ as E

RISKY = [
    "neardup_pairs_lsh",
    "ngram_jaccard_pairs",
    "winnow_fingerprints",
    "simhash_signatures",
    "embedding_neardup",
    "ivf_topk",
    "ivf_topk_kmeans",
    "corpus_retention",
    "simhash_neardup_pairs",
    "neardup_clusters",
    "corpus_retention_clustered",
    "kmv_distinct_estimate",
    "dataset_splits",
    "duplicate_spans",
    "strip_duplicate_spans",
    "bloom_decontaminate",
    "mixture_resample",
    "sq8_topk",
    "pq_topk",
    "pq_rerank_topk",
    "bpe_train_merges",
    "zorder_skipping_report",
    # wave 4-5 stochastic-risk additions: hash-derived sampling /
    # placement / curriculum salts, LSH-candidate reports, the k-means-
    # backed silhouette and the prefix-filtered exact join
    "weighted_sample_topk",
    "rendezvous_shards",
    "curriculum_order",
    "bbit_minhash_report",
    "cross_split_leakage",
    "silhouette_report",
    "allpairs_prefix_jaccard",
    "kcore_decomposition",
    # r6 iterative / hash-derived additions
    "link_components",
    "textrank_keywords",
    "tfidf_cosine_pairs",
    "srp_neardup_pairs",
]


def _snapshot(df):
    cols = sorted(df.columns)
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


@pytest.mark.parametrize("name", RISKY)
def test_query_is_deterministic(name, spark, sf_dir):
    fn = E.queries()[name]
    assert _snapshot(fn(spark, sf_dir)) == _snapshot(fn(spark, sf_dir))
