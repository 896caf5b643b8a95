#!/usr/bin/env python3
"""Local oracle-parity harness (builder-side only; mirrors the driver's
DuckDB compare). Usage:
    python3 tools/check_oracle.py <sfDir> <verifyOutDir> [query ...]
Reads <verifyOutDir>/<name>/ parquet (Spark result) and oracle_sql.json,
runs each SQL in DuckDB against the sfDir tables, compares:
  - schema: sorted column names
  - rows: multiset of tuples, columns sorted by name, values normalized
"""
import sys, json, glob, math, os

import duckdb
import pyarrow.parquet as pq

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def norm(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return v  # exact: the engine must be bit-identical to the oracle
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, list):
        return tuple(norm(x) for x in v)
    return v


def rows_of(cols, table):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for row in table:
        out.append(tuple(norm(row[i]) for i in idx))
    return sorted(out, key=lambda r: tuple((x is None, str(x)) for x in r))


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    failures = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        if os.path.exists(f"{out_dir}/{name}/_STALE_BUILD"):
            # a filtered Verify run marked this dir as belonging to an
            # older build — comparing it would silently mix builds
            print(f"[STALE] {name}: parquet is from a previous build "
                  f"(rerun Verify for it, or use a fresh outDir)")
            failures += 1
            continue
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"[MISS] {name}: no spark output")
            failures += 1
            continue
        spark_tbl = pq.read_table(files[0] if len(files) == 1 else f"{out_dir}/{name}")
        try:
            duck = con.execute(sql)
            duck_cols = [d[0] for d in duck.description]
            duck_rows = duck.fetchall()
        except Exception as e:
            print(f"[SQLERR] {name}: {e}")
            failures += 1
            continue
        s_cols = sorted(spark_tbl.column_names)
        d_cols = sorted(duck_cols)
        if s_cols != d_cols:
            print(f"[SCHEMA] {name}: spark={s_cols} duck={d_cols}")
            failures += 1
            continue
        s_rows = rows_of(spark_tbl.column_names,
                         [tuple(r[c] for c in spark_tbl.column_names)
                          for r in spark_tbl.to_pylist()])
        d_rows = rows_of(duck_cols, duck_rows)
        if len(s_rows) != len(d_rows):
            print(f"[ROWS] {name}: spark={len(s_rows)} duck={len(d_rows)}")
            failures += 1
            continue
        bad = [(a, b) for a, b in zip(s_rows, d_rows) if a != b]
        if bad:
            print(f"[VALUE] {name}: {len(bad)} differing rows; first: \n  spark={bad[0][0]}\n  duck ={bad[0][1]}")
            failures += 1
        else:
            print(f"[OK] {name}: {len(s_rows)} rows")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
