#!/usr/bin/env python3
"""Local dev harness mimicking the driver's correctness gate: run
graft.Verify first (writes <out>/<query>/ parquet + oracle_sql.json), then
this script compares each result against DuckDB on the same tables.

Usage: python3 scripts/check_oracle.py <sfDir> <verifyOutDir>
"""
import sys, json, glob, os
import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def norm(df):
    # driver semantics: sort columns by name, then sort rows, then hash values
    df = df[sorted(df.columns)]
    return df.sort_values(by=list(df.columns), ignore_index=True)

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for qdir in sorted(glob.glob(f"{out_dir}/*/")):
        name = qdir.rstrip("/").split("/")[-1]
        got = duckdb.sql(f"SELECT * FROM '{qdir}/*.parquet'").df()
        if name not in oracle:
            print(f"  {name}: rows-only ({len(got)} rows)" + (" EMPTY!" if len(got) == 0 else ""))
            continue
        want = con.sql(oracle[name]).df()
        g, w = norm(got), norm(want)
        ok = list(g.columns) == list(w.columns) and len(g) == len(w)
        detail = ""
        if ok:
            # dtype kind divergence (e.g. DuckDB HUGEINT -> float64 vs Spark
            # int64) would change value reprs on the driver side — fail it
            for c in g.columns:
                if g[c].dtype.kind != w[c].dtype.kind and {g[c].dtype.kind, w[c].dtype.kind} != {'i', 'u'}:
                    ok = False
                    detail = f"dtype kind mismatch col {c}: {g[c].dtype} vs {w[c].dtype}"
                    break
        if not ok and not detail:
            detail = f"cols {list(g.columns)} vs {list(w.columns)}; rows {len(g)} vs {len(w)}"
        else:
            import pandas as pd
            for c in g.columns:
                a, b = g[c], w[c]
                try:
                    if a.dtype.kind == 'f' or b.dtype.kind == 'f':
                        import numpy as np
                        # zero tolerance: queries are designed to be bit-exact
                        # vs the oracle (sequential folds, exact transforms,
                        # floor-based rounding)
                        bad = ~(np.isclose(a.astype(float), b.astype(float), rtol=0, atol=0) | (a.isna() & b.isna()))
                    else:
                        bad = ~((a == b) | (a.isna() & b.isna()))
                except Exception as e:
                    ok = False; detail = f"col {c}: {e}"; break
                if bad.any():
                    i = bad.idxmax()
                    ok = False; detail = f"col {c} row {i}: {a[i]!r} vs {b[i]!r} ({int(bad.sum())} diffs)"
                    break
        if ok:
            n_pass += 1; print(f"  {name}: OK ({len(g)} rows)")
        else:
            n_fail += 1; print(f"  {name}: FAIL {detail}")
    print(f"{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
