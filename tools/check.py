#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run graft.Verify at a
given SF, then compare each dumped parquet against the DuckDB oracle SQL
(column-name-sorted, row-sorted, exact value compare)."""
import json, sys, glob, os
import duckdb
import pandas as pd

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None

con = duckdb.connect()
for p in glob.glob(f"{sf_dir}/*.parquet"):
    name = os.path.basename(p)[:-8]
    con.sql(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")

oracle = json.load(open(f"{out}/oracle_sql.json"))
results = {}
for name, sql in sorted(oracle.items()):
    if only and name not in only:
        continue
    try:
        spark_df = pd.read_parquet(f"{out}/{name}")
    except Exception as e:
        results[name] = f"NO-SPARK-RESULT {e}"
        continue
    try:
        duck_df = con.sql(sql).df()
    except Exception as e:
        results[name] = f"ORACLE-FAIL {type(e).__name__} {e}"
        continue
    a = spark_df[sorted(spark_df.columns)]
    b = duck_df[sorted(duck_df.columns)]
    if list(a.columns) != list(b.columns):
        results[name] = f"SCHEMA-MISMATCH spark={list(a.columns)} duck={list(b.columns)}"
        continue
    a = a.sort_values(by=list(a.columns)).reset_index(drop=True)
    b = b.sort_values(by=list(b.columns)).reset_index(drop=True)
    if len(a) != len(b):
        results[name] = f"ROWCOUNT spark={len(a)} duck={len(b)}"
        continue
    try:
        pd.testing.assert_frame_equal(a, b, check_dtype=False, check_exact=True)
        results[name] = f"OK rows={len(a)}"
    except AssertionError as e:
        msg = str(e).split("\n")
        # find first differing cell for context
        diff = ""
        for c in a.columns:
            neq = (a[c] != b[c]) & ~(a[c].isna() & b[c].isna())
            if neq.any():
                i = neq.idxmax()
                diff = f" col={c} row={i} spark={a[c][i]!r} duck={b[c][i]!r} ndiff={int(neq.sum())}"
                break
        results[name] = "VALUE-MISMATCH" + diff + " | " + msg[0][:120]

ok = sum(1 for v in results.values() if v.startswith("OK"))
for k, v in sorted(results.items()):
    print(("PASS " if v.startswith("OK") else "FAIL ") + k + ": " + v)
print(f"\n{ok}/{len(results)} PASS")

# optional driver-style JSON artifact (CHECK_JSON_OUT=/path.json)
json_out = os.environ.get("CHECK_JSON_OUT")
if json_out:
    doc = {}
    for k, v in sorted(results.items()):
        passed = v.startswith("OK")
        # flags are null when the corresponding comparison never ran
        # (e.g. ORACLE-FAIL aborts before any row/schema check)
        if passed:
            rows, schema = True, True
        elif v.startswith("SCHEMA-MISMATCH"):
            rows, schema = None, False
        elif v.startswith("ROWCOUNT"):
            rows, schema = False, True
        elif v.startswith("VALUE-MISMATCH"):
            rows, schema = True, True
        else:  # NO-SPARK-RESULT / ORACLE-FAIL: nothing was compared
            rows, schema = None, None
        doc[k] = {
            "rows_match": rows,
            "schema_match": schema,
            "hash_match": passed,
            "err": None if passed else v,
        }
    with open(json_out, "w") as f:
        json.dump(doc, f, indent=1)
    print(f"wrote {json_out}")
