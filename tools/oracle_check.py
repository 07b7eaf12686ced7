#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/oracle_check.py <verify_out_dir> <sf_dir>

Reads each <name>/ parquet result written by graft.Verify plus
oracle_sql.json, runs the oracle SQL in DuckDB against the sf_dir
parquet tables, sorts columns by name and rows by all columns (the
driver's documented normalization), and compares values exactly.
"""
import json, math, sys
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                if math.isnan(v):
                    v = "NaN"
                else:
                    v = repr(v)
            vals.append(str(v))
        out.append(tuple(vals))
    out.sort()
    return [c for c in sorted(cols)], out


def main():
    outdir, sfdir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    n_ok = n_bad = 0
    for name, sql in sorted(oracle.items()):
        try:
            got = con.execute(f"SELECT * FROM '{outdir}/{name}/*.parquet'")
            gcols = [d[0] for d in got.description]
            grows = got.fetchall()
            exp = con.execute(sql)
            ecols = [d[0] for d in exp.description]
            erows = exp.fetchall()
        except Exception as e:
            print(f"FAIL {name}: {e}")
            n_bad += 1
            continue
        gc, gr = norm(grows, gcols)
        ec, er = norm(erows, ecols)
        if gc != ec:
            print(f"FAIL {name}: columns {gc} != {ec}")
            n_bad += 1
        elif gr != er:
            n_bad += 1
            diffs = [i for i, (a, b) in enumerate(zip(gr, er)) if a != b]
            print(f"FAIL {name}: {len(gr)} vs {len(er)} rows; first diffs:")
            for i in diffs[:3]:
                print(f"   spark {gr[i]}\n   duck  {er[i]}")
            if len(gr) != len(er):
                print(f"   row-count mismatch {len(gr)} vs {len(er)}")
        else:
            print(f"OK   {name} ({len(gr)} rows)")
            n_ok += 1
    print(f"== {n_ok} ok, {n_bad} fail")
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
