#!/usr/bin/env python3
"""Driver-mimic correctness compare: Spark Verify parquet dumps vs DuckDB
oracle SQL over the same sf tables. Sorts columns by name, rows by all
columns, and compares values (exact for non-floats, 1e-9 rel for floats).
Usage: compare_oracle.py <sfDir> <verifyOutDir>
"""
import json, math, sys
import duckdb

sf, out = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for tbl in ["region", "nation", "customer", "supplier", "part", "orders",
            "lineitem", "events", "documents", "embeddings"]:
    con.execute(f"CREATE VIEW {tbl} AS SELECT * FROM read_parquet('{sf}/{tbl}.parquet')")

oracle = json.load(open(f"{out}/oracle_sql.json"))

def norm(v):
    if isinstance(v, float):
        return round(v, 9)
    if isinstance(v, list):
        return tuple(norm(x) for x in v)
    return v

def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(norm(r[i]) for i in order) for r in rows)

fails, passes, skips = [], [], []
for name, sql in sorted(oracle.items()):
    try:
        spark_rel = con.sql(f"SELECT * FROM read_parquet('{out}/{name}/*.parquet')")
        scols, srows = spark_rel.columns, spark_rel.fetchall()
        duck_rel = con.sql(sql)
        dcols, drows = duck_rel.columns, duck_rel.fetchall()
    except Exception as e:
        fails.append((name, f"exec error: {e}"))
        continue
    if sorted(scols) != sorted(dcols):
        fails.append((name, f"schema cols spark={sorted(scols)} duck={sorted(dcols)}"))
        continue
    a, b = canon(srows, scols), canon(drows, dcols)
    if len(a) != len(b):
        fails.append((name, f"rowcount spark={len(a)} duck={len(b)}"))
        continue
    bad = None
    for x, y in zip(a, b):
        if x != y:
            ok = True
            for xv, yv in zip(x, y):
                if isinstance(xv, float) and isinstance(yv, float):
                    if not math.isclose(xv, yv, rel_tol=1e-7, abs_tol=1e-9):
                        ok = False
                elif xv != yv:
                    ok = False
            if not ok:
                bad = (x, y)
                break
    if bad:
        fails.append((name, f"value mismatch: spark={bad[0][:6]} duck={bad[1][:6]}"))
    else:
        passes.append((name, len(a)))

import os
all_q = set(os.listdir(out)) - {"oracle_sql.json"}
rows_only = sorted(all_q - set(oracle))
for q in rows_only:
    try:
        n = con.sql(f"SELECT count(*) FROM read_parquet('{out}/{q}/*.parquet')").fetchone()[0]
        (passes if n > 0 else fails).append((q + " [rows-only]", n if n > 0 else "0 rows"))
    except Exception as e:
        fails.append((q + " [rows-only]", f"read error: {e}"))

print(f"== PASS {len(passes)} ==")
for n, c in passes:
    print(f"  PASS {n} ({c} rows)")
print(f"== FAIL {len(fails)} ==")
for n, m in fails:
    print(f"  FAIL {n}: {m}")
sys.exit(1 if fails else 0)
