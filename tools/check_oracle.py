#!/usr/bin/env python3
"""Local replica of the driver's correctness gate (dev-only tool, not
part of the shipped library): run after `sbt "runMain graft.Verify
<sfDir> <outDir>"`, compares each <outDir>/<name> parquet against the
DuckDB oracle SQL in <outDir>/oracle_sql.json over the same tables.

Usage: python3 tools/check_oracle.py <sfDir> <outDir>
"""
import json, os, sys, math

import duckdb
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(val):
    if val is None:
        return "NULL"
    if isinstance(val, float):
        if math.isnan(val):
            return "NaN"
        return f"{val:.9g}"
    if isinstance(val, bytes):
        return val.hex()
    return str(val)


def table_rows(tbl):
    cols = sorted(tbl.column_names)
    data = [tbl.column(c).to_pylist() for c in cols]
    rows = sorted(tuple(canon(v) for v in row) for row in zip(*data))
    return cols, rows


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    names = [d for d in sorted(os.listdir(out_dir))
             if os.path.isdir(os.path.join(out_dir, d))]
    n_pass = n_fail = 0
    for name in names:
        got_tbl = pq.read_table(os.path.join(out_dir, name))
        if name not in oracle:
            print(f"[rows-only] {name}: rows={got_tbl.num_rows} "
                  f"(no oracle SQL)")
            continue
        try:
            exp_tbl = con.sql(oracle[name]).arrow()
        except Exception as e:
            print(f"[FAIL] {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        gc, gr = table_rows(got_tbl)
        ec, er = table_rows(exp_tbl)
        if gc != ec:
            print(f"[FAIL] {name}: schema mismatch spark={gc} duck={ec}")
            n_fail += 1
        elif gr != er:
            n_fail += 1
            print(f"[FAIL] {name}: rows spark={len(gr)} duck={len(er)}")
            diff_g = [r for r in gr if r not in set(map(tuple, er))][:3]
            diff_e = [r for r in er if r not in set(map(tuple, gr))][:3]
            print(f"       only-spark: {diff_g}")
            print(f"       only-duck:  {diff_e}")
        else:
            n_pass += 1
            print(f"[pass] {name}: {len(gr)} rows")
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
