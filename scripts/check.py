#!/usr/bin/env python3
"""Local pre-flight for the driver's correctness gate: run each oracle SQL in
DuckDB over the sf dir's parquet tables and compare against the Verify dump.

Usage: python3 scripts/check.py /root/testdata/sf0.01 /tmp/vout
"""
import json, sys, math, glob, os
import duckdb
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    # decimals -> float-insensitive string; timestamps -> isoformat
    import decimal, datetime
    if isinstance(v, decimal.Decimal):
        return float(v)
    if isinstance(v, (datetime.datetime, datetime.date)):
        return str(v)[:23]
    if isinstance(v, list):
        return tuple(norm(x) for x in v)
    return v

def close(a, b):
    a, b = norm(a), norm(b)
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b or abs(a - b) <= 1e-9 * max(1.0, abs(a), abs(b))
    return a == b

def main(sfdir, outdir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sfdir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracles = json.load(open(f"{outdir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(os.listdir(outdir)):
        d = os.path.join(outdir, name)
        if not os.path.isdir(d):
            continue
        files = glob.glob(f"{d}/*.parquet")
        got_t = pq.read_table(files[0]) if files else None
        if name not in oracles:
            rows = got_t.num_rows if got_t is not None else -1
            print(f"  [rows-only] {name}: {rows} rows")
            continue
        try:
            exp = con.execute(oracles[name]).fetch_arrow_table()
        except Exception as e:
            print(f"FAIL {name}: oracle sql error: {e}")
            n_fail += 1
            continue
        got = got_t
        gcols, ecols = sorted(got.column_names), sorted(exp.column_names)
        if gcols != ecols:
            print(f"FAIL {name}: columns {gcols} != {ecols}")
            n_fail += 1
            continue
        if got.num_rows != exp.num_rows:
            print(f"FAIL {name}: rows {got.num_rows} != {exp.num_rows}")
            n_fail += 1
            continue
        g = got.select(gcols).to_pylist()
        e = exp.select(ecols).to_pylist()
        bad = None
        for i, (gr, er) in enumerate(zip(g, e)):
            for c in gcols:
                if not close(gr[c], er[c]):
                    bad = (i, c, gr[c], er[c])
                    break
            if bad:
                break
        if bad:
            i, c, gv, ev = bad
            print(f"FAIL {name}: row {i} col {c}: got {gv!r} expected {ev!r}")
            n_fail += 1
        else:
            # exact-hash sensitivity probe: flag float mismatches that pass tolerance
            exact = all(norm(gr[c]) == norm(er[c]) for gr, er in zip(g, e) for c in gcols)
            tag = "" if exact else "  (tolerance-only match — may fail exact hash!)"
            print(f"  PASS {name} ({got.num_rows} rows){tag}")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
