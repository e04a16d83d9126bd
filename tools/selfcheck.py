"""Local replica of the driver's correctness gate: run every queries() entry
on Spark and its oracle_sql() on DuckDB at sf0.01, compare row count, column
names, and order-insensitive values. Usage:

    python tools/selfcheck.py [query ...]
"""

from __future__ import annotations

import sys
import time
import traceback

import duckdb
import pandas as pd

sys.path.insert(0, ".")

SF_DIR = "/root/testdata/sf0.01"
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        df[c] = df[c].map(lambda v: repr(v))
    return df.sort_values(by=list(df.columns), ignore_index=True)


def main(only: list[str]) -> int:
    from web3_knowledge_graph_spark.driver_queries import all_oracles, all_queries
    from web3_knowledge_graph_spark.session import get_spark

    spark = get_spark("selfcheck", cores=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    queries, oracles = all_queries(), all_oracles()
    failures = []
    for name, fn in queries.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, SF_DIR).toPandas()
        except Exception:
            print(f"FAIL {name}: spark query raised")
            traceback.print_exc()
            failures.append(name)
            continue
        if name not in oracles:
            print(f"okro {name}: rows={len(sdf)} (rows-only, no oracle) [{time.time()-t0:.1f}s]")
            if len(sdf) == 0:
                print(f"WARN {name}: zero rows")
            continue
        try:
            odf = con.execute(oracles[name]).fetchdf()
        except Exception:
            print(f"FAIL {name}: oracle raised")
            traceback.print_exc()
            failures.append(name)
            continue
        if len(sdf) != len(odf):
            print(f"FAIL {name}: rows spark={len(sdf)} oracle={len(odf)}")
            failures.append(name)
            continue
        if sorted(sdf.columns) != sorted(odf.columns):
            print(f"FAIL {name}: cols spark={sorted(sdf.columns)} oracle={sorted(odf.columns)}")
            failures.append(name)
            continue
        cs, co = canon(sdf), canon(odf)
        if not cs.equals(co):
            neq = (cs != co).any(axis=1)
            print(f"FAIL {name}: {int(neq.sum())}/{len(cs)} rows differ; first diffs:")
            merged = pd.concat(
                [cs[neq].head(3).add_suffix("_s"), co[neq].head(3).add_suffix("_o")], axis=1
            )
            print(merged.to_string()[:2000])
            failures.append(name)
            continue
        print(f"ok   {name}: rows={len(sdf)} [{time.time()-t0:.1f}s]")
        if len(sdf) == 0:
            print(f"WARN {name}: zero rows")
    print(f"\n{len(failures)} failures: {failures}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
