#!/usr/bin/env python3
"""Local dev harness mimicking the driver's t2 correctness gate.

Reads the Verify output dir (spark parquet per query + oracle_sql.json),
runs each oracle SQL in DuckDB over the same sf tables, and compares:
columns sorted by name, rows sorted by all columns, values compared
exactly (floats to 1e-9 report). Dev-only; NOT part of the Scala library.

Usage: python3 tools/check.py <sfDir> <verifyOutDir> [query ...]
"""
import json, math, sys

import duckdb

sfdir, outdir = sys.argv[1], sys.argv[2]
only = set(sys.argv[3:])

con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.execute(
        f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))

def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        rr = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                v = round(v, 9)
                if v == -0.0:
                    v = 0.0
            rr.append(v)
        out.append(tuple(rr))
    out.sort(key=lambda t: tuple((x is None, str(type(x)), x) for x in t))
    return sorted(cols), out

fail = ok = 0
for name, sql in sorted(oracle.items()):
    if only and name not in only:
        continue
    try:
        got = con.execute(
            f"SELECT * FROM read_parquet('{outdir}/{name}/*.parquet')")
        gcols = [d[0] for d in got.description]
        grows = got.fetchall()
        exp = con.execute(sql)
        ecols = [d[0] for d in exp.description]
        erows = exp.fetchall()
    except Exception as e:
        print(f"FAIL {name}: exec error: {e}")
        fail += 1
        continue
    # Driver-parity type check: DuckDB HUGEINT/DECIMAL outputs become
    # float64/decimal128 on the driver's pandas/arrow side and hash-mismatch
    # Spark's int64 even when Python-int equality passes below (r1 a8 bug).
    etypes = {r[0]: r[1] for r in con.execute(f"DESCRIBE {sql}").fetchall()}
    bad_types = {c: t for c, t in etypes.items()
                 if t == "HUGEINT" or t.startswith("DECIMAL")
                 or t.startswith("UTINYINT") or t.startswith("USMALLINT")
                 or t.startswith("UINTEGER") or t.startswith("UBIGINT")}
    if bad_types:
        print(f"WARN {name}: oracle cols with driver-lossy types: {bad_types}"
              " (cast to BIGINT/DOUBLE in the SQL)")
    gc, gr = canon(grows, gcols)
    ec, er = canon(erows, ecols)
    if gc != ec:
        print(f"FAIL {name}: cols spark={gc} oracle={ec}")
        fail += 1
    elif len(gr) != len(er):
        print(f"FAIL {name}: rows spark={len(gr)} oracle={len(er)}")
        fail += 1
    elif gr != er:
        bad = next(i for i in range(len(gr)) if gr[i] != er[i])
        print(f"FAIL {name}: first diff at row {bad}:\n  spark={gr[bad]}\n  oracle={er[bad]}")
        fail += 1
    else:
        print(f"ok   {name} ({len(gr)} rows)")
        ok += 1
print(f"\n{ok} ok, {fail} fail")
sys.exit(1 if fail else 0)
