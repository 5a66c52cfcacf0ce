#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: load each Verify output
parquet, run the oracle SQL in DuckDB over the same sf dir, normalize
(sort columns by name, sort rows), and compare values.

Usage: python3 tools/check_correctness.py [sfDir] [outDir]
"""
import glob
import json
import math
import os
import sys

import duckdb
import pandas as pd

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize dtypes: timestamps -> ns utc-naive strings, floats stay
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = pd.to_datetime(df[c]).dt.tz_localize(None).astype("datetime64[us]")
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def values_equal(a, b) -> bool:
    if pd.isna(a) and pd.isna(b):
        return True
    if isinstance(a, float) or isinstance(b, float):
        try:
            fa, fb = float(a), float(b)
        except (TypeError, ValueError):
            return str(a) == str(b)
        if math.isnan(fa) and math.isnan(fb):
            return True
        return fa == fb or abs(fa - fb) <= 1e-9 * max(1.0, abs(fa), abs(fb))
    return str(a) == str(b)


def main() -> None:
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")
    oracles = json.load(open(os.path.join(OUT, "oracle_sql.json")))
    n_pass = n_fail = n_rows_only = 0
    failures = []
    dirs = {d for d in os.listdir(OUT) if os.path.isdir(os.path.join(OUT, d))}
    # the manifest (full Verify runs) both drops stale dumps of retired
    # queries from a reused outDir AND makes an undumped rows-only query
    # visible as MISSING-DIR (it is in no oracle map, so dirs|oracles
    # alone can't see its absence — the r07 silent-shrink shape)
    expected = set(oracles)
    names_path = os.path.join(OUT, "names.json")
    if os.path.exists(names_path):
        manifest = set(json.load(open(names_path)))
        dirs &= manifest
        expected |= manifest
    for d in sorted(dirs | expected):
        path = os.path.join(OUT, d)
        if not os.path.isdir(path):
            print(f"MISSING-DIR  {d}")
            n_fail += 1
            failures.append(d)
            continue
        files = glob.glob(os.path.join(path, "*.parquet"))
        if not files:
            print(f"MISSING-OUTPUT {d}")
            n_fail += 1
            failures.append(d)
            continue
        got = pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)
        if d not in oracles:
            tag = "ROWS-ONLY"
            print(f"{tag:12s} {d}: rows={len(got)}")
            n_rows_only += 1
            if len(got) == 0:
                print(f"  !! zero rows for rows-only query {d}")
            continue
        try:
            exp = con.sql(oracles[d]).df()
        except Exception as e:  # noqa: BLE001
            print(f"ORACLE-ERR   {d}: {e}")
            n_fail += 1
            failures.append(d)
            continue
        g, e = norm(got), norm(exp)
        if list(g.columns) != list(e.columns):
            print(f"SCHEMA-DIFF  {d}: got {list(g.columns)} want {list(e.columns)}")
            n_fail += 1
            failures.append(d)
            continue
        if len(g) != len(e):
            print(f"ROWCOUNT     {d}: got {len(g)} want {len(e)}")
            n_fail += 1
            failures.append(d)
            continue
        bad = None
        for c in g.columns:
            gv, ev = g[c].tolist(), e[c].tolist()
            for i, (x, y) in enumerate(zip(gv, ev)):
                if not values_equal(x, y):
                    bad = (c, i, x, y)
                    break
            if bad:
                break
        if bad:
            c, i, x, y = bad
            print(f"VALUE-DIFF   {d}: col={c} row={i} got={x!r} want={y!r}")
            n_fail += 1
            failures.append(d)
        else:
            # exact-hash check (driver may hash exact reprs)
            exact = all(
                str(x) == str(y)
                for c in g.columns
                for x, y in zip(g[c].tolist(), e[c].tolist())
                if not (pd.isna(x) and pd.isna(y))
            )
            flag = "" if exact else "  (tolerance-only: repr mismatch!)"
            print(f"PASS         {d}: rows={len(g)}{flag}")
            n_pass += 1
    print(f"\n== {n_pass} pass, {n_fail} fail, {n_rows_only} rows-only ==")
    if failures:
        print("failures:", " ".join(failures))
        sys.exit(1)


if __name__ == "__main__":
    main()
