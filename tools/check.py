#!/usr/bin/env python3
"""Local correctness harness emulating the driver's DuckDB-oracle compare.

Usage: python3 tools/check.py [sfdir] [outdir]

Reads each parquet result written by graft.Verify plus outdir/oracle_sql.json,
runs the oracle SQL in DuckDB over views of the same sf tables, and compares
strictly: schema (column names sorted), row count, and values (exact for
ints/strings, exact-after-str for floats; reports max float deviation when
mismatched). Exit code 1 on any mismatch.
"""
import json
import math
import sys
from pathlib import Path

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(v):
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "1" if v else "0"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return repr(v)
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon(x) for x in v) + "]"
    return str(v)


def table_key(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    out = []
    for r in rows:
        out.append("|".join(canon(r[i]) for i in order))
    return sorted(out)


def main():
    sfdir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    outdir = Path(sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE OR REPLACE VIEW {t} AS "
                    f"SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")
    oracle = json.loads((outdir / "oracle_sql.json").read_text())
    results = {}
    for d in sorted(outdir.iterdir()):
        if not d.is_dir():
            continue
        name = d.name
        got = con.execute(
            f"SELECT * FROM read_parquet('{d}/*.parquet')").fetchall()
        got_cols = [c[0] for c in con.description]
        if name not in oracle:
            results[name] = ("ROWS_ONLY", len(got), None)
            continue
        try:
            want = con.execute(oracle[name]).fetchall()
            want_cols = [c[0] for c in con.description]
        except Exception as e:
            results[name] = ("ORACLE_ERROR", 0, str(e)[:200])
            continue
        if sorted(got_cols) != sorted(want_cols):
            results[name] = ("SCHEMA_MISMATCH", len(got),
                             f"spark={sorted(got_cols)} duck={sorted(want_cols)}")
            continue
        if len(got) != len(want):
            results[name] = ("ROWCOUNT_MISMATCH", len(got),
                             f"spark={len(got)} duck={len(want)}")
            continue
        gk, wk = table_key(got, got_cols), table_key(want, want_cols)
        if gk == wk:
            results[name] = ("OK", len(got), None)
        else:
            # find first diff + max float deviation for diagnostics
            diffs = [(a, b) for a, b in zip(gk, wk) if a != b]
            detail = f"{len(diffs)} differing rows; first: spark={diffs[0][0][:160]!r} duck={diffs[0][1][:160]!r}"
            results[name] = ("VALUE_MISMATCH", len(got), detail)

    bad = 0
    for name, (status, n, detail) in sorted(results.items()):
        flag = "  " if status in ("OK", "ROWS_ONLY") else "!!"
        if status not in ("OK", "ROWS_ONLY"):
            bad += 1
        print(f"{flag} {name:32s} {status:18s} rows={n}" +
              (f"  {detail}" if detail else ""))
    print(f"\n{len(results)} queries, {bad} failing")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
