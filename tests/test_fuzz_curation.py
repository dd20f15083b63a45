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
