#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: read Verify's
parquet dumps + oracle_sql.json, run each oracle in DuckDB over the
same sf dir, and compare (column-name-sorted, row-sorted, hashed).
Dev-only tooling — not part of the library.
Usage: check.py <sfDir> <outDir>
"""
import sys, json, glob, os
import duckdb
import pandas as pd

sfdir, outdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))

def canon(df):
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df

ok, bad, rowsonly, failed = [], [], [], []
for path in sorted(glob.glob(f"{outdir}/*")):
    name = os.path.basename(path)
    if not os.path.isdir(path):
        continue
    try:
        got = con.execute(f"SELECT * FROM read_parquet('{path}/*.parquet')").df()
    except Exception as e:
        failed.append((name, f"spark output unreadable: {e}")); continue
    if name not in oracle:
        rowsonly.append((name, len(got)))
        continue
    try:
        rel = con.sql(oracle[name])
        # The driver hashes stringified values, and DuckDB renders
        # HUGEINT (the silent sum(BIGINT) widening) differently from
        # Spark's BIGINT — rows/schema match but the hash gate fails.
        # pandas' check_dtype=False comparison below is blind to it,
        # so flag it structurally here (the r14 defect class).
        wide = [c for c, t in zip(rel.columns, rel.types)
                if str(t).upper() in ("HUGEINT", "UHUGEINT")]
        if wide:
            bad.append((name, f"oracle column(s) {wide} are HUGEINT — "
                        "CAST(... AS BIGINT) in the oracle SQL"))
            continue
        exp = rel.df()
    except Exception as e:
        failed.append((name, f"oracle failed: {e}")); continue
    g, e = canon(got), canon(exp)
    if list(g.columns) != list(e.columns):
        bad.append((name, f"columns {list(g.columns)} vs {list(e.columns)}"))
    elif len(g) != len(e):
        bad.append((name, f"rows {len(g)} vs {len(e)}"))
    else:
        try:
            pd.testing.assert_frame_equal(g, e, check_dtype=False, check_exact=True)
            ok.append(name)
        except AssertionError as ex:
            bad.append((name, str(ex).split("\n")[0][:200]))

print(f"== OK ({len(ok)}):", " ".join(ok))
empty = [n for n, c in rowsonly if c == 0]
for n, c in rowsonly:
    flag = " (EMPTY!)" if c == 0 else ""
    print(f"== ROWS-ONLY: {n}: {c} rows{flag}")
for n, m in bad:
    print(f"== MISMATCH: {n}: {m}")
for n, m in failed:
    print(f"== FAILED: {n}: {m}")
# an empty rows-only result is a dead operator (the r1 ann_lsh case)
sys.exit(1 if (bad or failed or empty) else 0)
