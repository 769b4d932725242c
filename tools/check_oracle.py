#!/usr/bin/env python3
"""Local replica of the driver's correctness gate (dev-only tool, not
part of the shipped library): run after `sbt "runMain graft.Verify
<sfDir> <outDir>"`, compares each <outDir>/<name> parquet against the
DuckDB oracle SQL in <outDir>/oracle_sql.json over the same tables.

The comparison is TYPE-SENSITIVE, like the driver's hash: a DuckDB
HUGEINT/DECIMAL column (e.g. an uncast SUM over integers) fails even
when every value prints identically to Spark's BIGINT. Round 5 went
red at the driver precisely because an earlier version of this tool
stringified values and let the types collide.

Usage: python3 tools/check_oracle.py <sfDir> <outDir> [--preflight]
  --preflight: only run each oracle through DuckDB and flag any
  HUGEINT/DECIMAL result column (the uncast-SUM footgun) without
  needing Spark output to diff against.
"""
import json, os, sys, math, decimal

import duckdb
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(val):
    if val is None:
        return "NULL"
    if isinstance(val, decimal.Decimal):
        return f"dec:{val}"
    if isinstance(val, float):
        if math.isnan(val):
            return "NaN"
        return f"{val:.9g}"
    if isinstance(val, bytes):
        return val.hex()
    return str(val)


def table_rows(tbl):
    cols = sorted(tbl.column_names)
    types = {c: str(tbl.schema.field(c).type) for c in cols}
    data = [tbl.column(c).to_pylist() for c in cols]
    rows = sorted(tuple(canon(v) for v in row) for row in zip(*data))
    return cols, types, rows


def is_widened(type_str):
    return type_str.startswith("decimal") or type_str == "int128"


def preflight(con, oracle):
    """Run every oracle; flag HUGEINT/DECIMAL result columns."""
    bad = 0
    for name in sorted(oracle):
        try:
            sch = con.sql(oracle[name]).arrow().schema
        except Exception as e:
            print(f"[FAIL] {name}: oracle SQL error: {e}")
            bad += 1
            continue
        offenders = [f"{f.name}:{f.type}" for f in sch
                     if is_widened(str(f.type))]
        if offenders:
            bad += 1
            print(f"[FAIL] {name}: widened integer column(s) "
                  f"{offenders} — add CAST(... AS BIGINT) in the oracle")
        else:
            print(f"[pass] {name}")
    print(f"== preflight: {bad} oracle(s) with widened columns ==")
    sys.exit(1 if bad else 0)


def main(sf_dir, out_dir, pre=False, only=None):
    con = duckdb.connect()
    # Bound DuckDB's spill: a mis-shaped oracle (e.g. a re-inlined CTE
    # chain at the sf1 rung) must error loudly, never fill the disk.
    con.execute("SET max_temp_directory_size='30GB'")
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.isdir(p):
            # Spark-written tables (e.g. the GenScale sf1 fixture) are
            # DIRECTORIES of part files, not single-file parquet
            p = os.path.join(p, "*.parquet")
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
        elif os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    if pre:
        preflight(con, oracle)
    names = [d for d in sorted(os.listdir(out_dir))
             if os.path.isdir(os.path.join(out_dir, d))]
    if only:
        names = [n for n in names if n in only]
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
        gc, gt, gr = table_rows(got_tbl)
        ec, et, er = table_rows(exp_tbl)
        # Only widening mismatches (one side HUGEINT/DECIMAL, the other
        # not) are flagged: the driver proved sensitive to exactly that,
        # and stricter equality (int32 vs int64, string vs
        # large_string) would red-flag queries the driver passes.
        type_diff = {c: (gt.get(c), et.get(c)) for c in set(gt) & set(et)
                     if is_widened(gt[c]) != is_widened(et[c])}
        if gc != ec:
            print(f"[FAIL] {name}: schema mismatch spark={gc} duck={ec}")
            n_fail += 1
        elif type_diff:
            print(f"[FAIL] {name}: column type mismatch "
                  f"(spark, duck) = {type_diff}")
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
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    only = None
    for a in sys.argv[1:]:
        if a.startswith("--only="):
            only = set(a[len("--only="):].split(","))
    main(args[0], args[1], pre="--preflight" in sys.argv, only=only)
