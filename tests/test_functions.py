"""Unit tests for the scalar-function library (functions/text.py) and the
events loader — known-answer checks independent of the DuckDB oracle."""

from pyspark.sql import functions as F

from jira_cdc_git_spark.functions import text as TX
from jira_cdc_git_spark.sources.registry import TABLES, load_table


def _one(spark, text, col):
    return spark.createDataFrame([(text,)], "t string").select(col(F.col("t")).alias("v")).first()["v"]


def test_token_count(spark):
    assert _one(spark, "a b  c", TX.token_count) == 3
    assert _one(spark, "  hello  ", TX.token_count) == 1


def test_shingles(spark):
    v = _one(spark, "a b c d", lambda c: TX.shingles(c, 3))
    assert sorted(v) == ["a b c", "b c d"]
    assert _one(spark, "a b", lambda c: TX.shingles(c, 3)) == []


def test_fingerprint_normalizes_whitespace_and_case(spark):
    a = _one(spark, "Hello   World", TX.fingerprint)
    b = _one(spark, "  hello world ", TX.fingerprint)
    c = _one(spark, "hello worlds", TX.fingerprint)
    assert a == b
    assert a != c


def test_stopword_ratio(spark):
    assert abs(_one(spark, "the cat sat on the mat", TX.stopword_ratio) - 2 / 6) < 1e-9


def test_simhash_near_identical_docs_differ_few_bits(spark):
    base = "spark window join filter aggregate shuffle partition broadcast " * 8
    variant = base + "extra"
    unrelated = "one two three four five six seven eight nine ten eleven twelve"
    df = spark.createDataFrame([(base,), (variant,), (unrelated,)], "t string").select(
        TX.simhash64(F.col("t")).alias("h")
    )
    h1, h2, h3 = [r["h"] for r in df.collect()]

    def ham(a, b):
        return bin((a ^ b) & (2**64 - 1)).count("1")

    near, far = ham(h1, h2), ham(h1, h3)
    assert near <= 10, f"near-identical hamming {near} too high"
    assert near < far, f"near ({near}) should be < unrelated ({far})"


def test_simhash_different_docs_differ_many_bits(spark):
    df = spark.createDataFrame(
        [("alpha beta gamma delta epsilon zeta",), ("one two three four five six",)],
        "t string",
    ).select(TX.simhash64(F.col("t")).alias("h"))
    h1, h2 = [r["h"] for r in df.collect()]
    ham = bin((h1 ^ h2) & (2**64 - 1)).count("1")
    assert ham >= 10


def test_all_tables_load(spark, sf_dir):
    for t in TABLES:
        df = load_table(spark, t, sf_dir)
        assert df.count() > 0, t


def test_events_ts_is_timestamp(spark, sf_dir):
    ev = load_table(spark, "events", sf_dir)
    assert dict(ev.dtypes)["ts"] == "timestamp"
    r = ev.agg(F.min("ts").alias("lo"), F.max("ts").alias("hi")).first()
    assert r["lo"].year == 2024
