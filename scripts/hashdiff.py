#!/usr/bin/env python3
"""Strict differ: mimic a dtype/repr-sensitive hash compare between the
Verify dump and the DuckDB oracle. Reports arrow schema diffs and the first
value whose repr differs (even when numerically equal), per query.

Usage: python3 scripts/hashdiff.py /root/testdata/sf0.01 /tmp/vout [name...]
"""
import json, sys, glob, os
import duckdb
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def main(sfdir, outdir, only):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sfdir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracles = json.load(open(f"{outdir}/oracle_sql.json"))
    for name in sorted(os.listdir(outdir)):
        d = os.path.join(outdir, name)
        if not os.path.isdir(d) or name not in oracles:
            continue
        if only and name not in only:
            continue
        files = glob.glob(f"{d}/*.parquet")
        got = pq.read_table(files[0])
        exp = con.execute(oracles[name]).fetch_arrow_table()
        cols = sorted(got.column_names)
        gs = {f.name: str(f.type) for f in got.schema}
        es = {f.name: str(f.type) for f in exp.schema}
        sdiff = {c: (gs.get(c), es.get(c)) for c in cols if gs.get(c) != es.get(c)}
        # row-sorted exact repr compare
        import pandas as pd
        def key(t):
            rows = t.select(cols).to_pylist()
            return sorted((tuple(repr(r[c]) for c in cols) for r in rows))
        try:
            gk, ek = key(got), key(exp)
            vdiff = None
            for i, (a, b) in enumerate(zip(gk, ek)):
                if a != b:
                    vdiff = (i, [(c, x, y) for c, x, y in zip(cols, a, b) if x != y])
                    break
        except Exception as e:
            vdiff = ("sort-error", str(e))
        if sdiff or vdiff:
            print(f"== {name}")
            if sdiff:
                print(f"   schema: {sdiff}")
            if vdiff:
                print(f"   value:  {vdiff}")

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], set(sys.argv[3:]))
