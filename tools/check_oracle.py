#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run graft.Verify via sbt,
then execute each oracle SQL in DuckDB over the same parquet tables and
compare (columns sorted by name, values hashed row-wise after sorting).
Usage: python3 tools/check_oracle.py [sfdir] [outdir]
"""
import json, subprocess, sys, glob, os
import duckdb

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def canon(rows, cols):
    # sort columns by name, then rows lexicographically; stringify values
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(repr(r[i]) for i in order))
    return sorted(out), [cols[i] for i in order]

def array_cols(rows, cols):
    # The DRIVER's gate canonicalizes with pandas, which cannot sort rows
    # on array-typed cells (numpy.ndarray is unhashable) — our repr-based
    # canon would mask that, so flag any complex-typed output column as a
    # failure here even though we could hash it.
    bad = set()
    for r in rows[:100]:
        for i, v in enumerate(r):
            if isinstance(v, (list, dict, set)) or type(v).__name__ == "ndarray":
                bad.add(cols[i])
    return sorted(bad)

def main():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")
    oracle = json.load(open(f"{OUT}/oracle_sql.json"))
    results = {}
    for name in sorted(os.listdir(OUT)):
        pdir = os.path.join(OUT, name)
        if not os.path.isdir(pdir):
            continue
        files = glob.glob(f"{pdir}/*.parquet")
        if not files:
            results[name] = "NO_OUTPUT"
            continue
        got = con.execute(f"SELECT * FROM read_parquet('{pdir}/*.parquet')")
        grows, gcols = got.fetchall(), [d[0] for d in got.description]
        bad = array_cols(grows, gcols)
        if bad:
            results[name] = (f"ARRAY_TYPED_OUTPUT {bad}: the driver's pandas "
                             "canonicalizer cannot sort these — stringify "
                             "(concat_ws) in the query")
            continue
        if name not in oracle:
            results[name] = f"ROWS_ONLY({len(grows)})"
            continue
        try:
            exp = con.execute(oracle[name])
            erows, ecols = exp.fetchall(), [d[0] for d in exp.description]
        except Exception as e:
            results[name] = f"ORACLE_SQL_ERROR: {e}"
            continue
        gc, gn = canon(grows, gcols)
        ec, en = canon(erows, ecols)
        if gn != en:
            results[name] = f"SCHEMA_MISMATCH spark={gn} duckdb={en}"
        elif gc == ec:
            results[name] = f"MATCH({len(grows)})"
        else:
            diff = [i for i, (a, b) in enumerate(zip(gc, ec)) if a != b][:3]
            msg = f"HASH_MISMATCH rows={len(grows)}vs{len(erows)}"
            for i in diff:
                msg += f"\n    spark[{i}]={gc[i]}\n    duck [{i}]={ec[i]}"
            if len(gc) != len(ec):
                only_g = set(gc) - set(ec)
                only_e = set(ec) - set(gc)
                msg += f"\n    only_spark={list(only_g)[:2]}\n    only_duck={list(only_e)[:2]}"
            results[name] = msg
    npass = sum(1 for v in results.values() if v.startswith(("MATCH", "ROWS_ONLY")))
    for k, v in results.items():
        print(f"{k}: {v}")
    print(f"\n{npass}/{len(results)} ok")

if __name__ == "__main__":
    main()
