"""Differential tests: every queries() entry with an oracle must match its
DuckDB result exactly (rowcount, columns, values) — the same comparison the
driver's correctness gate runs, here at sf0.001 for speed."""

import pytest

import __spark_entry__ as E
from _diffcheck import compare

QS = E.queries()
ORACLES = E.oracle_sql()


def test_every_oracle_key_has_query():
    assert set(ORACLES) <= set(QS)


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_parity(name, spark, ddb, sf_dir):
    sdf = QS[name](spark, sf_dir).toPandas()
    odf = ddb.execute(ORACLES[name]).fetchdf()
    assert len(sdf) == len(odf), f"rowcount {len(sdf)} != {len(odf)}"
    diff = compare(name, sdf, odf)
    assert diff is None, diff


def test_entry_smoke(spark):
    df = E.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert "sum_qty" in df.columns
