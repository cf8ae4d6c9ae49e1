#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Usage: python3 tools/check.py <sfDir> <outDir> [q1,q2,...]
Reads each <outDir>/<name> parquet (written by graft.Verify), runs the
matching oracle_sql.json statement in DuckDB with views over <sfDir>, and
compares schema + values (column-name-sorted, row-sorted, exact).
"""
import json
import sys
from pathlib import Path

import duckdb
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    out = []
    for r in rows:
        out.append(tuple(norm(r[i]) for i in order))
    out.sort(key=repr)
    return [colnames[i] for i in order], out


def norm(v):
    import datetime
    import decimal
    if isinstance(v, float):
        return repr(v)
    if isinstance(v, decimal.Decimal):
        return repr(float(v))
    if isinstance(v, datetime.datetime):
        return v.isoformat()
    if isinstance(v, list):
        return tuple(norm(x) for x in v)
    return v


def main(sf_dir, out_dir, only=None):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.loads((Path(out_dir) / "oracle_sql.json").read_text())
    n_pass = n_fail = 0
    for name in sorted(oracle):
        if only and name not in only:
            continue
        pdir = Path(out_dir) / name
        if not pdir.exists():
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        files = list(pdir.glob("*.parquet"))
        tbl = pq.read_table(files[0]) if files else None
        if tbl is None:
            print(f"FAIL {name}: empty output dir")
            n_fail += 1
            continue
        spark_cols = tbl.column_names
        spark_rows = [tuple(r.values()) for r in tbl.to_pylist()]
        try:
            res = con.execute(oracle[name])
            duck_cols = [d[0] for d in res.description]
            duck_rows = res.fetchall()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_fail += 1
            continue
        sc, sr = canon(spark_rows, spark_cols)
        dc, dr = canon(duck_rows, duck_cols)
        if sc != dc:
            print(f"FAIL {name}: columns {sc} vs {dc}")
            n_fail += 1
            continue
        if sr != dr:
            n_fail += 1
            print(f"FAIL {name}: {len(sr)} vs {len(dr)} rows", end="")
            diffs = [(a, b) for a, b in zip(sr, dr) if a != b]
            if diffs:
                print(f"; first diff: spark={diffs[0][0]} duck={diffs[0][1]}")
            else:
                print("; rows only in one side:",
                      (set(map(repr, sr)) ^ set(map(repr, dr))) and
                      list(set(map(repr, sr)) ^ set(map(repr, dr)))[:2])
            continue
        n_pass += 1
        print(f"PASS {name} ({len(sr)} rows)")
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2],
                  set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None))
