#!/usr/bin/env python3
"""Local stand-in for the driver's t2 correctness gate.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>

Runs each oracle_sql.json query in DuckDB against the sfDir parquet tables,
loads the Spark result parquet written by graft.Verify, normalizes both
(columns sorted by name, rows sorted by all columns), and reports exact /
approx equality per query.
"""
import glob
import json
import math
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def compare(name, spark_df, duck_df):
    if sorted(spark_df.columns) != sorted(duck_df.columns):
        return f"SCHEMA MISMATCH spark={sorted(spark_df.columns)} duck={sorted(duck_df.columns)}"
    if len(spark_df) != len(duck_df):
        return f"ROWCOUNT MISMATCH spark={len(spark_df)} duck={len(duck_df)}"
    a, b = normalize(spark_df), normalize(duck_df)
    bad = []
    for c in a.columns:
        av, bv = a[c], b[c]
        # The driver hashes raw cell reprs, so an int64 Spark column vs a
        # float64 oracle column (e.g. DuckDB HUGEINT -> fetchdf float64)
        # hash-fails even when values are numerically equal. Flag dtype-class
        # mismatches instead of silently coercing, so local PASS predicts the
        # driver's verdict.
        def _cls(dt):
            s = str(dt)
            if s.startswith(("int", "uint", "Int", "UInt")):
                return "int"
            if s.startswith(("float", "Float")):
                return "float"
            return "other"
        if {_cls(av.dtype), _cls(bv.dtype)} == {"int", "float"}:
            bad.append((c, "DIFF", f"dtype class spark={av.dtype} vs oracle={bv.dtype} (driver hash would fail)"))
            continue
        if str(av.dtype).startswith("float") or str(bv.dtype).startswith("float"):
            av = pd.to_numeric(av, errors="coerce").astype(float)
            bv = pd.to_numeric(bv, errors="coerce").astype(float)
            exact = (av.fillna(-1e308) == bv.fillna(-1e308)).all()
            close = all(
                (math.isnan(x) and math.isnan(y)) or math.isclose(x, y, rel_tol=1e-9, abs_tol=1e-12)
                for x, y in zip(av.fillna(float("nan")), bv.fillna(float("nan"))))
            if not exact:
                bad.append((c, "close" if close else "DIFF",
                            next(((x, y) for x, y in zip(av, bv) if x != y and not (math.isnan(x) and math.isnan(y))), None)))
        else:
            av, bv = av.astype(str), bv.astype(str)
            if not (av == bv).all():
                i = (av != bv).idxmax()
                bad.append((c, "DIFF", (av[i], bv[i])))
    if not bad:
        return "OK"
    if all(kind == "close" for _, kind, _ in bad):
        return "CLOSE " + "; ".join(f"{c}: {ex}" for c, _, ex in bad)
    return "FAIL " + "; ".join(f"{c}[{k}]: {ex}" for c, k, ex in bad)


def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    json_out = sys.argv[3] if len(sys.argv) > 3 else None
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    results = {}
    for name, sql in sorted(oracle.items()):
        parts = sorted(glob.glob(f"{outdir}/{name}/*.parquet"))
        if not parts:
            results[name] = "NO SPARK OUTPUT"
            continue
        spark_df = pd.concat([pd.read_parquet(p) for p in parts], ignore_index=True)
        try:
            duck_df = con.execute(sql).fetchdf()
        except Exception as e:  # noqa: BLE001
            results[name] = f"ORACLE ERROR: {e}"
            continue
        try:
            results[name] = compare(name, spark_df, duck_df)
        except Exception as e:  # noqa: BLE001
            results[name] = f"COMPARE ERROR: {e}"
    # rows-only queries (no oracle): just check rows>0
    for d in sorted(glob.glob(f"{outdir}/*/")):
        name = d.rstrip("/").split("/")[-1]
        if name in oracle:
            continue
        parts = sorted(glob.glob(f"{d}/*.parquet"))
        n = sum(len(pd.read_parquet(p)) for p in parts) if parts else 0
        results[name] = f"rows-only: {n} rows" + ("" if n > 0 else "  <-- EMPTY!")
    width = max(len(k) for k in results)
    ok = 0
    for k, v in sorted(results.items()):
        flag = "PASS" if v == "OK" or v.startswith("rows-only: ") and "EMPTY" not in v else "????"
        ok += flag == "PASS"
        print(f"{k:<{width}}  {flag}  {v if v != 'OK' else ''}")
    print(f"\n{ok}/{len(results)} pass")
    if json_out:
        payload = {
            "sf_dir": sfdir,
            "gates": {k: {"verdict": ("PASS" if v == "OK" or
                          (v.startswith("rows-only: ") and "EMPTY" not in v)
                          else "FAIL"), "detail": v}
                      for k, v in sorted(results.items())},
            "pass": ok, "total": len(results),
        }
        with open(json_out, "w") as f:
            json.dump(payload, f, indent=1)


if __name__ == "__main__":
    main()
