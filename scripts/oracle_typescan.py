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

# Coverage caveat: this audit only sees oracles present in the dumped
# JSON. The literal-replay oracles (ann_ivf*, ann_pq, ann_ivfpq*) are
# registered DYNAMICALLY after their query trains a model, so a dump
# produced by graft.tools.OracleDump (which runs no queries) will not
# contain them — only a full graft.Verify dump does. The runtime
# HUGEINT gate in check.py covers them on every Verify run.
DYNAMIC = {"ann_ivf", "ann_ivf_index", "ann_ivf_index_delta",
           "ann_ivf_index_probed", "ann_hybrid_rrf_index",
           "ann_pq", "ann_ivfpq", "ann_ivfpq_index",
           "sql_ann_ivf_index"}  # carries ann_ivf_index's replay (r18)
missing_dynamic = sorted(DYNAMIC - set(oracle))
if missing_dynamic:
    print(f"NOTE: {len(missing_dynamic)} dynamic literal-replay oracles "
          f"absent from this dump (not scanned): {' '.join(missing_dynamic)}")

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
