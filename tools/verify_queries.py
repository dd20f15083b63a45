"""Spot oracle verification at a chosen SF: run named queries (or all)
against the DuckDB oracle with the same compare the parity suite uses.

    python tools/verify_queries.py [--sf /root/testdata/sf0.01] q1 q2 ...
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests")
)

import duckdb

import __spark_entry__ as E
from _diffcheck import compare
from jira_cdc_git_spark.session import get_spark
from jira_cdc_git_spark.sources.registry import TABLES


def main() -> None:
    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.001"
    if "--sf" in args:
        i = args.index("--sf")
        sf_dir = args[i + 1]
        del args[i : i + 2]
    names = args or sorted(E.oracle_sql())
    spark = get_spark(app_name="verify")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    qs, oracles = E.queries(), E.oracle_sql()
    n_bad = 0
    for name in names:
        try:
            sdf = qs[name](spark, sf_dir).toPandas()
            odf = con.execute(oracles[name]).fetchdf()
            if len(sdf) != len(odf):
                print(f"FAIL {name}: rowcount {len(sdf)} != {len(odf)}")
                n_bad += 1
                continue
            diff = compare(name, sdf, odf)
            if diff is not None:
                print(f"FAIL {name}: {diff}")
                n_bad += 1
            else:
                print(f"ok   {name}")
        except Exception as exc:
            print(f"ERR  {name}: {type(exc).__name__}: {exc}")
            n_bad += 1
    print(f"done: {len(names) - n_bad}/{len(names)} green at {sf_dir}")
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
