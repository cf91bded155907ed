"""Side-by-side checker mimicking the driver's correctness gate:
run every queries()[name] in Spark and oracle_sql()[name] in DuckDB on
the same sf dir; compare row count, sorted-column schema, and values
(order-insensitive).  Usage: python tools/check_oracle.py [sf_dir] [names...]
"""

from __future__ import annotations

import sys

import duckdb
import numpy as np
import pandas as pd


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            try:
                df[c] = df[c].astype(str)
            except Exception:
                pass
        # decimals -> float
        if str(df[c].dtype).startswith("decimal") or df[c].dtype == object:
            pass
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def compare(name: str, got: pd.DataFrame, want: pd.DataFrame) -> bool:
    ok = True
    if sorted(got.columns) != sorted(want.columns):
        print(f"  [{name}] SCHEMA MISMATCH spark={sorted(got.columns)} oracle={sorted(want.columns)}")
        return False
    if len(got) != len(want):
        print(f"  [{name}] ROWCOUNT MISMATCH spark={len(got)} oracle={len(want)}")
        ok = False
    g, w = normalize(got), normalize(want)
    if len(g) == len(w):
        for c in g.columns:
            gv, wv = g[c], w[c]
            try:
                gvf = gv.astype(float).to_numpy()
                wvf = wv.astype(float).to_numpy()
                if not np.allclose(gvf, wvf, rtol=0, atol=0, equal_nan=True):
                    bad = int((~np.isclose(gvf, wvf, rtol=0, atol=0, equal_nan=True)).sum())
                    mx = float(np.nanmax(np.abs(gvf - wvf)))
                    print(f"  [{name}] VALUE MISMATCH col={c} n_bad={bad} max_abs_diff={mx:.3e}")
                    ok = False
                continue
            except (TypeError, ValueError):
                pass
            if not gv.astype(str).equals(wv.astype(str)):
                n_bad = int((gv.astype(str) != wv.astype(str)).sum())
                print(f"  [{name}] VALUE MISMATCH col={c} n_bad={n_bad}")
                ex = (gv.astype(str) != wv.astype(str))
                print("    spark :", gv[ex].head(3).tolist())
                print("    oracle:", wv[ex].head(3).tolist())
                ok = False
    return ok


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as e
    from kmcp_spark.config import get_spark

    spark = get_spark(cores=8)
    con = duckdb.connect()
    for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs, osql = e.queries(), e.oracle_sql()
    n_pass = n_fail = n_rows_only = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            got = fn(spark, sf_dir).toPandas()
        except Exception as ex:
            print(f"  [{name}] SPARK ERROR: {ex}")
            n_fail += 1
            continue
        if name not in osql:
            print(f"~ {name}: rows-only ({len(got)} rows)")
            n_rows_only += 1
            continue
        try:
            want = con.execute(osql[name]).df()
        except Exception as ex:
            print(f"  [{name}] ORACLE ERROR: {ex}")
            n_fail += 1
            continue
        if compare(name, got, want):
            print(f"+ {name}: OK ({len(got)} rows)")
            n_pass += 1
        else:
            n_fail += 1
    print(f"\npass={n_pass} fail={n_fail} rows_only={n_rows_only}")
    spark.stop()
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
