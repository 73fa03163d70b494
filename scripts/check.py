#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Usage: python3 scripts/check.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name> parquet result (written by graft.Verify),
runs the matching oracle SQL from oracle_sql.json in DuckDB over the same
tables, and compares: columns sorted by name, rows sorted, values
normalized (timestamps → isoformat, floats kept exact).
"""
import json, sys, glob, os
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)

    def cell(v):
        try:
            if v is None or (isinstance(v, float) and pd.isna(v)) or v is pd.NaT:
                return "<NULL>"
        except (TypeError, ValueError):
            pass
        return str(v)

    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            df[c] = s.astype("datetime64[us]").map(cell)
        elif s.dtype == object or pd.api.types.is_bool_dtype(s):
            df[c] = s.map(cell)
        elif pd.api.types.is_integer_dtype(s):
            df[c] = s.astype("int64")
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracles = json.load(f)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    results = {}
    names = sorted(os.path.basename(p) for p in glob.glob(f"{out_dir}/*")
                   if os.path.isdir(p))
    for name in names:
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            results[name] = "NO_OUTPUT"
            continue
        got = pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)
        if name not in oracles:
            results[name] = f"ROWS_ONLY({len(got)})"
            continue
        try:
            want = con.execute(oracles[name]).fetchdf()
        except Exception as e:
            results[name] = f"ORACLE_ERROR: {e}"
            continue
        g, w = normalize(got), normalize(want)
        if list(g.columns) != list(w.columns):
            results[name] = f"SCHEMA_MISMATCH spark={list(g.columns)} duck={list(w.columns)}"
        elif len(g) != len(w):
            results[name] = f"ROWCOUNT {len(g)} vs {len(w)}"
        elif not g.equals(w):
            neq = (g != w) & ~(g.isna() & w.isna())
            bad_cols = [c for c in g.columns if neq[c].any()]
            # show first differing row per bad column
            detail = []
            for c in bad_cols[:3]:
                i = neq[c].idxmax()
                detail.append(f"{c}[{i}]: {g[c][i]!r} vs {w[c][i]!r}")
            results[name] = "VALUE_MISMATCH " + "; ".join(detail)
        else:
            results[name] = "OK"
    n_ok = sum(1 for v in results.values() if v == "OK")
    for k, v in sorted(results.items()):
        print(f"{'PASS' if v == 'OK' else 'FAIL' if not v.startswith('ROWS_ONLY') else 'ROWS'}  {k}: {v}")
    print(f"\n{n_ok}/{len([k for k in results if not results[k].startswith('ROWS_ONLY')])} oracle-checked queries pass; "
          f"{sum(1 for v in results.values() if v.startswith('ROWS_ONLY'))} rows-only")


if __name__ == "__main__":
    main()
