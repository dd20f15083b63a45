"""Parametric differential fuzzing of the corpus-curation operators: the
registry checks one parameterization; these run RANDOM parameters against
a parametrically-generated DuckDB oracle (or an algebraic invariant), so
correctness isn't an artifact of the default constants."""

from __future__ import annotations

import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from _diffcheck import compare
from jira_cdc_git_spark.operators import text as T

_SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _check(name, sdf: pd.DataFrame, odf: pd.DataFrame) -> None:
    assert len(sdf) == len(odf), f"{name}: rows {len(sdf)} != {len(odf)}"
    diff = compare(name, sdf, odf)
    assert diff is None, f"{name}: {diff}"


@given(
    k=st.integers(min_value=1, max_value=5),
    n_salts=st.integers(min_value=1, max_value=16),
)
@settings(**_SETTINGS)
def test_salted_collect_is_salt_invariant(spark, sf_dir, k, n_salts):
    # exactness of the salted rewrite: ANY salt count must give the same
    # rows as the unsalted (n_salts=1) formulation — if slicing per salt
    # bucket lost a globally-minimal doc_id, this catches it
    salted = T.token_examples_salted(spark, sf_dir, k=k, n_salts=n_salts)
    plain = T.token_examples_salted(spark, sf_dir, k=k, n_salts=1)
    assert salted.exceptAll(plain).count() == 0
    assert plain.exceptAll(salted).count() == 0


@given(
    n=st.integers(min_value=2, max_value=6),
    min_docs=st.integers(min_value=2, max_value=4),
)
@settings(**_SETTINGS)
def test_boilerplate_ngrams_random_params(spark, ddb, sf_dir, n, min_docs):
    sdf = T.boilerplate_ngrams(spark, sf_dir, n=n, min_docs=min_docs).toPandas()
    odf = ddb.execute(f"""
        WITH t AS (
            SELECT doc_id, string_split_regex(trim(text), '\\s+') AS toks
            FROM documents
        ), shs AS (
            SELECT doc_id, list_distinct(
                CASE WHEN len(toks) >= {n}
                     THEN list_transform(
                         generate_series(1, CAST(len(toks) AS INTEGER) - {n - 1}),
                         i -> array_to_string(toks[i:i+{n - 1}], ' '))
                     ELSE [] END) AS grams
            FROM t
        ), g AS (
            SELECT doc_id, unnest(grams) AS gram FROM shs
        ), boiler AS (
            SELECT gram FROM g GROUP BY gram
            HAVING count(DISTINCT doc_id) >= {min_docs}
        ), pd AS (
            SELECT g.doc_id, count(*) AS n_boiler
            FROM g JOIN boiler USING (gram) GROUP BY 1
        )
        SELECT s.doc_id,
               CAST(len(s.grams) AS INTEGER) AS n_grams,
               coalesce(pd.n_boiler, 0) AS n_boiler,
               CASE WHEN len(s.grams) > 0
                    THEN floor(coalesce(pd.n_boiler, 0) * 1.0 / len(s.grams)
                               * 10000 + 0.5) / 10000
                    END AS boiler_frac
        FROM shs s LEFT JOIN pd ON s.doc_id = pd.doc_id
    """).fetchdf()
    _check(f"boilerplate(n={n},min_docs={min_docs})", sdf, odf)


@given(
    n=st.integers(min_value=3, max_value=8),
    mod=st.integers(min_value=3, max_value=20),
)
@settings(**_SETTINGS)
def test_decontaminate_random_params(spark, ddb, sf_dir, n, mod):
    sdf = T.decontaminate(spark, sf_dir, n=n, bench_mod=mod).toPandas()
    odf = ddb.execute(f"""
        WITH t AS (
            SELECT doc_id, string_split_regex(trim(text), '\\s+') AS toks
            FROM documents
        ), shs AS (
            SELECT doc_id, list_distinct(
                CASE WHEN len(toks) >= {n}
                     THEN list_transform(
                         generate_series(1, CAST(len(toks) AS INTEGER) - {n - 1}),
                         i -> array_to_string(toks[i:i+{n - 1}], ' '))
                     ELSE [] END) AS grams
            FROM t
        ), g AS (
            SELECT doc_id, unnest(grams) AS gram FROM shs
        ), bench AS (
            SELECT DISTINCT gram FROM g WHERE doc_id % {mod} = 0
        ), hits AS (
            SELECT g.doc_id, count(*) AS n_shared
            FROM g JOIN bench USING (gram)
            WHERE g.doc_id % {mod} != 0 GROUP BY 1
        )
        SELECT h.doc_id,
               CAST(len(s.grams) AS INTEGER) AS n_grams,
               h.n_shared,
               floor(h.n_shared * 1.0 / len(s.grams) * 10000 + 0.5) / 10000
                 AS contam_frac
        FROM hits h JOIN shs s ON h.doc_id = s.doc_id
    """).fetchdf()
    _check(f"decontaminate(n={n},mod={mod})", sdf, odf)


@given(n_shards=st.integers(min_value=1, max_value=32))
@settings(**_SETTINGS)
def test_corpus_shards_random_shard_count(spark, ddb, sf_dir, n_shards):
    sdf = T.corpus_shards(spark, sf_dir, n_shards=n_shards).toPandas()
    odf = ddb.execute(f"""
        WITH h AS (
            SELECT doc_id,
                   md5('shard:' || CAST(doc_id AS VARCHAR)) AS h,
                   ('0x' || substr(md5('shard:' || CAST(doc_id AS VARCHAR)),
                                   1, 8))::BIGINT % {n_shards} AS shard
            FROM documents
        )
        SELECT doc_id, shard,
               CAST(row_number() OVER (PARTITION BY shard ORDER BY h)
                    AS INTEGER) AS pos
        FROM h
    """).fetchdf()
    _check(f"corpus_shards(n={n_shards})", sdf, odf)


@given(cap=st.integers(min_value=1, max_value=25))
@settings(**_SETTINGS)
def test_source_cap_random_cap(spark, ddb, sf_dir, cap):
    sdf = T.source_cap_sample(spark, sf_dir, cap=cap).toPandas()
    odf = ddb.execute(f"""
        WITH h AS (
            SELECT doc_id, source,
                   md5('cap:' || CAST(doc_id AS VARCHAR)) AS h
            FROM documents
        )
        SELECT doc_id, source, pos
        FROM (SELECT doc_id, source,
                     CAST(row_number() OVER (PARTITION BY source
                                             ORDER BY h, doc_id) AS INTEGER)
                       AS pos
              FROM h) t
        WHERE pos <= {cap}
    """).fetchdf()
    _check(f"source_cap(cap={cap})", sdf, odf)


@given(budget=st.integers(min_value=100, max_value=8000))
@settings(**_SETTINGS)
def test_token_budget_random_budget(spark, ddb, sf_dir, budget):
    # the two-pass hash-block prefix sum must equal the flat per-lang
    # cumsum at ANY budget — exactness of the distributed decomposition
    sdf = T.token_budget_sample(spark, sf_dir, budget=budget).toPandas()
    odf = ddb.execute(f"""
        WITH t AS (
            SELECT doc_id, lang,
                   CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT)
                     AS n_tokens,
                   md5('bud:' || CAST(doc_id AS VARCHAR)) AS h
            FROM documents
        ), c AS (
            SELECT doc_id, lang, n_tokens,
                   sum(n_tokens) OVER (PARTITION BY lang ORDER BY h, doc_id
                                       ROWS UNBOUNDED PRECEDING) AS cum
            FROM t
        )
        SELECT doc_id, lang, n_tokens, CAST(cum AS BIGINT) AS cum_tokens
        FROM c WHERE cum <= {budget}
    """).fetchdf()
    _check(f"token_budget(budget={budget})", sdf, odf)


@given(
    k=st.integers(min_value=5, max_value=80),
    min_count=st.integers(min_value=2, max_value=10),
)
@settings(**_SETTINGS)
def test_pmi_topk_random_params(spark, ddb, sf_dir, k, min_count):
    sdf = T.pmi_topk(spark, sf_dir, k=k, min_count=min_count).toPandas()
    odf = ddb.execute(f"""
        WITH t AS (
            SELECT doc_id, string_split_regex(trim(text), '\\s+') AS toks
            FROM documents
        ), bgr AS (
            SELECT b.w1 AS w1, b.w2 AS w2
            FROM (SELECT unnest(list_transform(
                      generate_series(1, CAST(len(toks) AS INTEGER) - 1),
                      i -> struct_pack(w1 := toks[i], w2 := toks[i+1]))) AS b
                  FROM t WHERE len(toks) >= 2) x
        ), bc AS (
            SELECT w1, w2, count(*) AS c_bg FROM bgr GROUP BY 1, 2
        ), uc AS (
            SELECT tok AS w, count(*) AS c_w
            FROM (SELECT unnest(toks) AS tok FROM t) u GROUP BY 1
        ), tot AS (
            SELECT (SELECT sum(c_bg) * 1.0 FROM bc) AS t_bg,
                   (SELECT sum(c_w) * 1.0 FROM uc) AS t_ug
        )
        SELECT w1, w2, c_bg,
               floor(ln((c_bg / t_bg)
                        / ((u1.c_w / t_ug) * (u2.c_w / t_ug)))
                     * 10000 + 0.5) / 10000 AS pmi
        FROM bc JOIN uc u1 ON bc.w1 = u1.w JOIN uc u2 ON bc.w2 = u2.w
        CROSS JOIN tot
        WHERE c_bg >= {min_count}
        ORDER BY pmi DESC, w1, w2
        LIMIT {k}
    """).fetchdf()
    _check(f"pmi(k={k},min_count={min_count})", sdf, odf)


@given(
    threshold=st.sampled_from([0.5, 0.8, 0.95]),
    n_centroids=st.integers(min_value=4, max_value=32),
)
@settings(**_SETTINGS)
def test_semdedup_random_params(spark, ddb, sf_dir, threshold, n_centroids):
    from jira_cdc_git_spark.operators import vectors as V

    sdf = V.semdedup(
        spark, sf_dir, threshold=threshold, n_centroids=n_centroids
    ).toPandas()
    odf = ddb.execute(f"""
        WITH clones AS (
            SELECT vec_id + 1000000 AS vec_id,
                   list_prepend(CAST(embedding[1] + 0.01 AS FLOAT),
                                embedding[2:]) AS embedding
            FROM embeddings WHERE vec_id % 10 = 0
        ), corpus AS (
            SELECT vec_id, embedding FROM embeddings
            UNION ALL
            SELECT vec_id, embedding FROM clones
        ), e AS (
            SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM corpus
        ), cents AS (
            SELECT vec_id AS cent_id, emb AS ce FROM e
            ORDER BY vec_id LIMIT {n_centroids}
        ), assigned AS (
            SELECT vec_id, emb, cent_id AS cluster_id
            FROM (SELECT e.vec_id, e.emb, c.cent_id,
                         row_number() OVER (
                             PARTITION BY e.vec_id
                             ORDER BY list_dot_product(e.emb, c.ce)
                                      / sqrt(list_dot_product(e.emb, e.emb)
                                             * list_dot_product(c.ce, c.ce))
                                      DESC, c.cent_id) AS rn
                  FROM e CROSS JOIN cents c) t
            WHERE rn = 1
        ), losers AS (
            SELECT DISTINCT b.vec_id
            FROM assigned a JOIN assigned b
              ON a.cluster_id = b.cluster_id AND a.vec_id < b.vec_id
            WHERE round(list_dot_product(a.emb, b.emb)
                        / sqrt(list_dot_product(a.emb, a.emb)
                               * list_dot_product(b.emb, b.emb)), 4)
                  >= {threshold}
        )
        SELECT a.vec_id, a.cluster_id, l.vec_id IS NULL AS keep
        FROM assigned a LEFT JOIN losers l ON a.vec_id = l.vec_id
    """).fetchdf()
    _check(f"semdedup(t={threshold},k={n_centroids})", sdf, odf)


@given(bucket_minutes=st.sampled_from([5, 17, 60, 240, 1440]))
@settings(**_SETTINGS)
def test_range_join_bucket_width_invariant(spark, sf_dir, bucket_minutes):
    # the bucket width is a pure cost knob — ANY width must produce the
    # identical join result (exactness of the bucketed decomposition)
    from jira_cdc_git_spark.operators import timeseries as TS

    base = TS.range_join_concurrency(spark, sf_dir, bucket_minutes=60)
    other = TS.range_join_concurrency(
        spark, sf_dir, bucket_minutes=bucket_minutes
    )
    assert other.exceptAll(base).count() == 0
    assert base.exceptAll(other).count() == 0
