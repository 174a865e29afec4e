#!/usr/bin/env python3
"""Local mirror of the driver's DuckDB correctness gate.

Usage: python3 tools/compare.py <sfDir> <verifyOutDir>

For each query dir under verifyOutDir: load the Spark parquet result, run the
matching oracle SQL (oracle_sql.json) in DuckDB over the sfDir parquet tables,
sort columns by name + rows by all columns, and compare values cell-wise
(doubles with tolerance). Prints a per-query verdict and a summary.
"""
import json
import math
import sys
from pathlib import Path

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize date-ish columns to string for stable compare
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime") or df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


def cmp_frames(a: pd.DataFrame, b: pd.DataFrame) -> str:
    if sorted(a.columns) != sorted(b.columns):
        return f"SCHEMA MISMATCH spark={sorted(a.columns)} oracle={sorted(b.columns)}"
    if len(a) != len(b):
        return f"ROWCOUNT MISMATCH spark={len(a)} oracle={len(b)}"
    # the driver's hash is dtype-sensitive: a DuckDB HUGEINT sum arriving as
    # float64 against Spark's int64 hashes differently even when every value
    # matches (the a16 round-3 failure). Flag int-vs-float kind drift so the
    # local gate catches it before the driver does.
    for c in a.columns:
        k1, k2 = a[c].dtype.kind, b[c].dtype.kind
        if {k1, k2} == {"i", "f"}:
            return (f"DTYPE KIND MISMATCH col={c} spark={a[c].dtype} "
                    f"oracle={b[c].dtype} (CAST the oracle aggregate to BIGINT)")
    a, b = canon(a), canon(b)
    for c in a.columns:
        av, bv = a[c], b[c]
        if av.dtype.kind == "f" or bv.dtype.kind == "f":
            # Bit-exact like the driver's hash compare (set LOOSE=1 for triage).
            import os
            av = pd.to_numeric(av, errors="coerce")
            bv = pd.to_numeric(bv, errors="coerce")
            if os.environ.get("LOOSE"):
                bad = ~(((av - bv).abs() <= 1e-6 + 1e-9 * bv.abs()) | (av.isna() & bv.isna()))
            else:
                bad = ~((av == bv) | (av.isna() & bv.isna()))
        else:
            bad = ~((av == bv) | (av.isna() & bv.isna()))
        if bad.any():
            i = bad.idxmax()
            return f"VALUE MISMATCH col={c} row={i} spark={a[c][i]!r} oracle={b[c][i]!r} ({int(bad.sum())} cells)"
    return "OK"


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = Path(sf_dir) / f"{t}.parquet"
        if p.is_dir():  # multi-file tables (the amplified sf1 corpus)
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}/*.parquet')")
        elif p.exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.loads((Path(out_dir) / "oracle_sql.json").read_text())
    results = {}
    for qdir in sorted(Path(out_dir).iterdir()):
        if not qdir.is_dir():
            continue
        name = qdir.name
        spark_df = pd.concat(
            [pd.read_parquet(f) for f in qdir.glob("*.parquet")], ignore_index=True) \
            if list(qdir.glob("*.parquet")) else pd.DataFrame()
        if name not in oracle:
            results[name] = f"ROWS-ONLY rows={len(spark_df)}" + (" (EMPTY!)" if len(spark_df) == 0 else "")
            continue
        try:
            odf = con.execute(oracle[name]).df()
        except Exception as e:
            results[name] = f"ORACLE ERROR {e}"
            continue
        try:
            results[name] = cmp_frames(spark_df, odf)
        except Exception as e:
            results[name] = f"COMPARE ERROR {e}"
    # a query that threw in Verify leaves NO result dir — surface it instead
    # of letting the pass count silently shrink
    for name in oracle:
        if name not in results:
            results[name] = "MISSING RESULT (query failed in Verify?)"
    ok = sum(1 for v in results.values()
             if v == "OK" or (v.startswith("ROWS-ONLY") and "EMPTY" not in v))
    bad = {k: v for k, v in results.items() if not (v == "OK" or (v.startswith("ROWS-ONLY") and "EMPTY" not in v))}
    for k in sorted(results):
        print(f"{k:32s} {results[k]}")
    print(f"\n{ok}/{len(results)} pass")
    sys.exit(0 if not bad else 1)


main()
