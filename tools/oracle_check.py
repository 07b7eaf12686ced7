#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/oracle_check.py <verify_out_dir> <sf_dir> [names]

Reads each <name>/ parquet result written by graft.Verify plus
oracle_sql.json, runs the oracle SQL in DuckDB against the sf_dir
parquet tables, sorts columns by name and rows by all columns, and
compares values exactly.

Comparison runs in PANDAS mode (duckdb .df() on both sides), because
that is the strictest plausible driver behavior: DuckDB's HUGEINT
(e.g. any un-CAST integer sum) becomes float64 in pandas and renders
"1.0" where Spark's parquet int64 renders "1" — a mismatch invisible
to fetchall() (both sides give Python int). r1/r2 lesson: the two
queries that failed the driver hash while passing the old fetchall
checker both output un-CAST window sums. Keep every oracle column
CAST to the exact Spark output type (BIGINT/DOUBLE/...).
"""
import json, math, sys
import duckdb
import numpy as np

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def fmt(v):
    if v is None:
        return "None"
    if isinstance(v, (float, np.floating)):
        f = float(v)
        return "NaN" if math.isnan(f) else repr(f)
    if isinstance(v, (bool, np.bool_)):
        return str(bool(v))
    if isinstance(v, (int, np.integer)):
        return str(int(v))
    if isinstance(v, np.ndarray):
        return "[" + ", ".join(fmt(x) for x in v.tolist()) + "]"
    if isinstance(v, (list, tuple)):
        return "[" + ", ".join(fmt(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ", ".join(f"{k}: {fmt(x)}" for k, x in sorted(v.items())) + "}"
    return str(v)


def reject_nested(df, side, name):
    """Driver parity: the driver sorts result rows with pandas, which
    crashes on ndarray/list/dict cells (TypeError: unhashable type) —
    r7's q_bpe_encode ERRORed at the driver while this checker passed it
    because fmt() stringifies arrays before sorting. Any nested-typed
    result column is therefore a hard local FAIL: emit array_join(...)
    strings or explode to rows instead."""
    for c in df.columns:
        for v in df[c]:
            if isinstance(v, (np.ndarray, list, tuple, dict)):
                raise ValueError(
                    f"{side} column '{c}' of {name} is array/struct-typed "
                    "(driver's pandas row-sort crashes on nested cells); "
                    "emit a joined string or explode to rows")
            if v is not None:
                break


def norm_df(df):
    cols = sorted(df.columns)
    rows = []
    for t in df[cols].itertuples(index=False, name=None):
        rows.append(tuple(fmt(v) for v in t))
    rows.sort()
    return cols, rows


def main():
    outdir, sfdir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    n_ok = n_bad = 0
    for name, sql in sorted(oracle.items()):
        if only is not None and name not in only:
            continue
        try:
            gdf = con.execute(f"SELECT * FROM '{outdir}/{name}/*.parquet'").df()
            edf = con.execute(sql).df()
            reject_nested(gdf, "spark", name)
            reject_nested(edf, "oracle", name)
        except Exception as e:
            print(f"FAIL {name}: {e}")
            n_bad += 1
            continue
        gc, gr = norm_df(gdf)
        ec, er = norm_df(edf)
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
