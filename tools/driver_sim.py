"""Simulate the driver's verify pass locally.

Runs entry(spark) at sf0.001, then every queries() entry at sf0.01 and
compares against oracle_sql() via DuckDB with the same strictness the
driver uses: row count, column-name set, and ORDER-INSENSITIVE EXACT
value comparison (floats must match bit-for-bit after the query's own
rounding — that is the engine's float discipline).

Usage: python tools/driver_sim.py [--sf-dir /root/testdata/sf0.01] [query ...]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(pdf: pd.DataFrame) -> pd.DataFrame:
    """BYTE-COMPATIBLE with the grading driver's _canon: sort columns by
    name, then sort rows by every column — with NO special handling of
    list/array cells.  An array-typed output column therefore CRASHES
    here exactly as it crashes the driver ('unhashable type: list'), so
    queries must serialize arrays; round 1 shipped two such crashes
    because this sim silently tuple-converted lists."""
    pdf = pdf[sorted(pdf.columns)].copy()
    for c in pdf.columns:
        if pd.api.types.is_datetime64_any_dtype(pdf[c]):
            pdf[c] = pd.to_datetime(pdf[c]).astype("datetime64[us]")
    return pdf.sort_values(list(pdf.columns), kind="mergesort").reset_index(drop=True)


def compare(name: str, spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame) -> list[str]:
    problems = []
    if len(spark_pdf) != len(oracle_pdf):
        problems.append(f"rowcount spark={len(spark_pdf)} oracle={len(oracle_pdf)}")
    if sorted(spark_pdf.columns) != sorted(oracle_pdf.columns):
        problems.append(f"schema spark={sorted(spark_pdf.columns)} oracle={sorted(oracle_pdf.columns)}")
    if problems:
        return problems
    a, b = canon(spark_pdf), canon(oracle_pdf)
    for c in a.columns:
        av, bv = a[c], b[c]
        if pd.api.types.is_float_dtype(av) or pd.api.types.is_float_dtype(bv):
            # BIT-EXACT, like the driver's canonical-bytes hash: the round-2
            # escape was -0.0 vs +0.0, which compare equal under `==` but
            # hash differently.  View the float64 bit patterns as uint64 and
            # compare those; NaN (any payload) vs NaN with the same payload
            # is equal, NaN vs non-NaN or -0.0 vs +0.0 is NOT.
            ab = av.astype(float).to_numpy(dtype=np.float64).view(np.uint64)
            bb = bv.astype(float).to_numpy(dtype=np.float64).view(np.uint64)
            eq = pd.Series(ab == bb, index=av.index)
        else:
            eq = (av.fillna("__null__") == bv.fillna("__null__")) if av.dtype == object else (
                av.isna() & bv.isna()) | (av == bv)
        if not bool(eq.all()):
            bad = int((~eq).sum())
            i = int(np.argmax(~eq.to_numpy()))
            problems.append(
                f"col {c}: {bad} mismatches, first at row {i}: spark={a[c].iloc[i]!r} oracle={b[c].iloc[i]!r}"
            )
    return problems


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--skip-entry", action="store_true")
    ap.add_argument("--json", default=None,
                    help="write a per-query result summary to this path")
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    import __spark_entry__ as mod
    from pulsarfeatureextractor_spark.session import get_spark

    spark = get_spark(app_name="driver-sim", master="local[8]", shuffle_partitions=8)

    if not args.skip_entry:
        t0 = time.time()
        edf = mod.entry(spark)
        rows = edf.count()
        print(f"entry(): {rows} rows, schema={edf.schema.simpleString()[:120]} [{time.time()-t0:.1f}s]")
        assert rows > 0

    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(args.sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    qs = mod.queries()
    oracles = mod.oracle_sql()
    names = args.names or list(qs)
    n_ok = n_bad = n_rowsonly = 0
    results: dict[str, dict] = {}
    for pos, name in enumerate(names, start=1):
        t0 = time.time()
        try:
            sdf = qs[name](spark, args.sf_dir).toPandas()
        except Exception as e:
            print(f"FAIL  {name}: spark raised {type(e).__name__}: {e}")
            results[name] = {"pos": pos, "status": "fail",
                             "err": f"spark {type(e).__name__}: {e}"[:300]}
            n_bad += 1
            continue
        dt = time.time() - t0
        if name not in oracles:
            print(f"rows  {name}: {len(sdf)} rows (no oracle) [{dt:.1f}s]")
            results[name] = {"pos": pos, "status": "rows_only",
                             "rows": len(sdf), "sec": round(dt, 2)}
            n_rowsonly += 1
            continue
        try:
            odf = con.sql(oracles[name]).df()
        except Exception as e:
            print(f"FAIL  {name}: oracle raised {type(e).__name__}: {e}")
            results[name] = {"pos": pos, "status": "fail",
                             "err": f"oracle {type(e).__name__}: {e}"[:300]}
            n_bad += 1
            continue
        problems = compare(name, sdf, odf)
        if problems:
            print(f"FAIL  {name} [{dt:.1f}s]")
            for p in problems[:4]:
                print(f"      {p}")
            results[name] = {"pos": pos, "status": "fail",
                             "rows": len(sdf), "problems": problems[:4]}
            n_bad += 1
        else:
            print(f"OK    {name}: {len(sdf)} rows [{dt:.1f}s]")
            results[name] = {"pos": pos, "status": "ok",
                             "rows": len(sdf), "sec": round(dt, 2)}
            n_ok += 1
    print(f"\n{n_ok} ok, {n_rowsonly} rows-only, {n_bad} failed")
    if args.json:
        import json

        with open(args.json, "w") as f:
            json.dump({"sf_dir": args.sf_dir, "n_ok": n_ok,
                       "n_rows_only": n_rowsonly, "n_failed": n_bad,
                       "compare": "bit-exact float64 (uint64 view)",
                       "queries": results}, f, indent=1)
        print(f"wrote {args.json}")
    return 1 if n_bad else 0


if __name__ == "__main__":
    sys.exit(main())
