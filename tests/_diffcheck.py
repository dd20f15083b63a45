"""Standalone differential check: run every queries() entry on Spark and its
oracle_sql() on DuckDB at the given sf dir; compare rowcount + sorted values.
Usage: python tests/_diffcheck.py [sf_dir] [name ...]
"""
import sys

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, "/root/repo")
import __spark_entry__ as E
from jira_cdc_git_spark.session import get_spark
from jira_cdc_git_spark.sources.registry import TABLES


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("Int64")
    return df.sort_values(by=list(df.columns), ignore_index=True)


def compare(name, sdf, odf):
    if len(sdf) != len(odf):
        return f"ROWS spark={len(sdf)} oracle={len(odf)}"
    if sorted(sdf.columns) != sorted(odf.columns):
        return f"COLS spark={sorted(sdf.columns)} oracle={sorted(odf.columns)}"
    a, b = normalize(sdf), normalize(odf)
    bad = []
    for c in a.columns:
        # The driver's value-hash is dtype-sensitive: a DuckDB HUGEINT that
        # lands in pandas as float64 hashes differently from Spark's int64
        # even when every value is numerically identical (round-3 red row on
        # sequence_packing). Flag any float-vs-integer class mismatch.
        if pd.api.types.is_float_dtype(a[c]) != pd.api.types.is_float_dtype(b[c]):
            bad.append(
                f"{c}: DTYPE class mismatch spark={a[c].dtype} oracle={b[c].dtype}"
                " (driver value-hash would differ)"
            )
        elif pd.api.types.is_float_dtype(a[c]):
            eq = np.isclose(a[c].fillna(np.nan), b[c].fillna(np.nan), rtol=0, atol=1e-9, equal_nan=True)
            exact = (a[c].fillna(-1.5) == b[c].fillna(-1.5))
            if not eq.all():
                bad.append(f"{c}: {int((~eq).sum())} diffs e.g. {a[c][~eq].head(3).tolist()} vs {b[c][~eq].head(3).tolist()}")
            elif not exact.all():
                bad.append(f"{c}: EXACT-only {int((~exact).sum())} ulp diffs")
        else:
            eq = (a[c].astype(object).where(a[c].notna(), None) == b[c].astype(object).where(b[c].notna(), None)) | (a[c].isna() & b[c].isna())
            if not eq.all():
                bad.append(f"{c}: {int((~eq).sum())} diffs e.g. spark={a[c][~eq].head(3).tolist()} oracle={b[c][~eq].head(3).tolist()}")
    return "; ".join(bad) or None


def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark(cpus=16)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    qs, os_ = E.queries(), E.oracle_sql()
    n_ok = n_fail = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf).toPandas()
        except Exception as ex:
            print(f"FAIL {name}: spark error {type(ex).__name__}: {str(ex)[:300]}")
            n_fail += 1
            continue
        if name not in os_:
            print(f"SKIP {name}: no oracle ({len(sdf)} rows)")
            continue
        try:
            odf = con.execute(os_[name]).fetchdf()
        except Exception as ex:
            print(f"FAIL {name}: duckdb error {type(ex).__name__}: {str(ex)[:300]}")
            n_fail += 1
            continue
        diff = compare(name, sdf, odf)
        if diff:
            print(f"FAIL {name}: {diff}")
            n_fail += 1
        else:
            print(f"OK   {name} ({len(sdf)} rows)")
            n_ok += 1
    print(f"\n{n_ok} ok, {n_fail} fail")


if __name__ == "__main__":
    main()
