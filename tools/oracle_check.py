#!/usr/bin/env python3
"""Local differential check: graft.Verify parquet output vs DuckDB oracle SQL.

Mimics the driver's t2 gate (sort columns by name, compare values with float
tolerance) so oracle mismatches are caught before the round ends.

Usage: python3 tools/oracle_check.py <sfDir> <verifyOutDir> [query ...]
"""
import json, math, sys

import duckdb
import pandas as pd
import numpy as np


def load_spark(outdir, name):
    import glob
    files = glob.glob(f"{outdir}/{name}/*.parquet")
    if not files:
        return None
    return pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)


def normalize(df):
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]") if df[c].dt.tz is None \
                else df[c].dt.tz_convert("UTC").dt.tz_localize(None).astype("datetime64[us]")
        elif df[c].dtype == object:
            # The driver's compare sorts raw column values: a list/ndarray
            # cell crashes its lexsort (unhashable ndarray, round 7:
            # q_encode_ids/q_pack_ids). Stringifying here would hide that —
            # fail the same way the driver does.
            head = df[c].dropna().head(20)
            if any(isinstance(v, (list, np.ndarray)) for v in head):
                raise TypeError(
                    f"column {c!r} holds arrays — the driver cannot sort "
                    "these; project to a scalar (length + joined string)")
            df[c] = df[c].astype(str)
        elif pd.api.types.is_integer_dtype(df[c]) or df[c].dtype == bool:
            # Unify int widths to int64 WITHOUT losing integerness: the
            # driver's exact hash distinguishes int from float/HUGEINT
            # representations, so coercing to float64 here would mask
            # oracle-typing bugs (it did, in round 5: q_pack_chunks).
            df[c] = df[c].astype("int64")
        try:
            if str(df[c].dtype) in ("float32",):
                df[c] = df[c].astype("float64")
        except Exception:
            pass
    return df.sort_values(by=list(df.columns), na_position="last").reset_index(drop=True)


def compare(name, a, b):
    if a is None:
        return f"{name}: MISSING spark output"
    if set(a.columns) != set(b.columns):
        return f"{name}: COLUMN MISMATCH spark={sorted(a.columns)} oracle={sorted(b.columns)}"
    a, b = normalize(a), normalize(b)
    if len(a) != len(b):
        return f"{name}: ROW COUNT spark={len(a)} oracle={len(b)}"
    for c in a.columns:
        av, bv = a[c], b[c]
        ai, bi = pd.api.types.is_integer_dtype(av), pd.api.types.is_integer_dtype(bv)
        if ai != bi:
            # One side integral, the other not: the driver's exact hash WILL
            # differ even if the values are numerically equal. The classic
            # cause is DuckDB widening a windowed sum(BIGINT) to HUGEINT
            # (arrives as float64/object) — fix with CAST(... AS BIGINT) in
            # the oracle SQL.
            return (f"{name}: DTYPE MISMATCH col={c} "
                    f"spark={av.dtype} oracle={bv.dtype} "
                    f"(HUGEINT widening? CAST the oracle column to BIGINT)")
        if pd.api.types.is_float_dtype(av) and pd.api.types.is_float_dtype(bv):
            ana, bna = av.isna(), bv.isna()
            if not ana.equals(bna):
                return f"{name}: NULL MISMATCH col={c}"
            ok = np.isclose(av.fillna(0), bv.fillna(0), rtol=1e-6, atol=1e-9)
            if not ok.all():
                i = int(np.argmin(ok))
                return (f"{name}: VALUE MISMATCH col={c} row{i} "
                        f"spark={av.iloc[i]} oracle={bv.iloc[i]}")
        else:
            if not av.astype(str).equals(bv.astype(str)):
                neq = av.astype(str) != bv.astype(str)
                i = int(np.argmax(neq.values))
                return (f"{name}: VALUE MISMATCH col={c} row{i} "
                        f"spark={av.iloc[i]!r} oracle={bv.iloc[i]!r}")
    return None


def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    failed, passed, skipped = [], 0, 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        try:
            b = con.sql(sql).df()
        except Exception as e:
            failed.append(f"{name}: ORACLE SQL ERROR {e}")
            continue
        a = load_spark(outdir, name)
        try:
            err = compare(name, a, b)
        except TypeError as e:
            err = f"{name}: UNSORTABLE COLUMN {e}"
        if err:
            failed.append(err)
        else:
            passed += 1
    print(f"PASS {passed} / FAIL {len(failed)}")
    for f in failed:
        print("  " + f)
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
