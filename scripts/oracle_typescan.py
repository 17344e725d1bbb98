#!/usr/bin/env python3
"""Static audit of every DuckDB oracle's RESULT TYPES — catches the
r14 defect class (sum(BIGINT) silently widening to HUGEINT, which the
driver's hash canonicalizer renders differently from Spark's BIGINT)
without running a single Spark query. Dev-only tooling.
Usage: oracle_typescan.py <sfDir> <oracleJson>
"""
import sys, json
import duckdb

sfdir, path = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")

oracle = json.load(open(path))
bad, failed = [], []
for name, sql in sorted(oracle.items()):
    try:
        rel = con.sql(sql)
        wide = [c for c, t in zip(rel.columns, rel.types)
                if str(t).upper() in ("HUGEINT", "UHUGEINT")]
        if wide:
            bad.append((name, wide))
    except Exception as e:
        failed.append((name, str(e).split("\n")[0][:160]))
print(f"scanned {len(oracle)} oracles")
for n, w in bad:
    print(f"== HUGEINT: {n}: {w}")
for n, m in failed:
    print(f"== FAILED-TO-PLAN: {n}: {m}")
sys.exit(1 if bad or failed else 0)
