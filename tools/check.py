#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate.

Usage: python3 tools/check.py [sfdir] [outdir]

Runs DuckDB on each oracle_sql.json entry (tables = sfdir parquet files,
registered as views by name) and compares against the parquet the Scala
Verify main dumped to outdir/<name>/. Column order is normalized by sorting
column names; rows are compared as sorted tuples (exact match).

Run `sbt "runMain graft.Verify <sfdir> <outdir>"` first.
"""
import json
import math
import os
import struct
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # SIGN-PRESERVING: the driver hashes raw values, so -0.0 != 0.0
        # there; the r7 judge confirmed this mirror's old `v + 0.0` hid
        # exactly the q_embed_cov red row. Compare the IEEE bit pattern.
        return f"f64:{struct.pack('>d', v).hex()}"
    return v


def main():
    sfdir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    outdir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_verify"
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    # GRAFT_CHECK_SKIP: comma-separated query names whose ORACLE is too
    # slow for the scale being swept (DuckDB's q_label_prop at sf0.1 runs
    # ~10 min) — list the skips loudly so a partial sweep can't read as full
    skip = {s for s in os.environ.get("GRAFT_CHECK_SKIP", "").split(",") if s}
    if skip:
        print(f"-- skipping {len(skip)} oracles by request: {sorted(skip)}")
    # GRAFT_CHECK_ONLY: restrict to a comma-separated subset for local
    # iteration (pairs with Verify's SPARK_GRAFT_VERIFY_ONLY); the driver
    # never sets it, so its runs always compare the full surface
    only = {s for s in os.environ.get("GRAFT_CHECK_ONLY", "").split(",") if s}
    if only:
        oracle = {k: v for k, v in oracle.items() if k in only}
        print(f"-- restricted to {len(oracle)} oracles by request")
    n_ok = 0
    for name, sql in sorted(oracle.items()):
        if name in skip:
            continue
        try:
            got = con.sql(
                f"SELECT * FROM read_parquet('{outdir}/{name}/*.parquet')")
            got_cols = sorted(got.columns)
            got_rows = sorted(
                tuple(canon(v) for v in row)
                for row in con.sql(
                    f"SELECT {', '.join(got_cols)} FROM got").fetchall())
        except Exception as e:
            print(f"FAIL {name}: spark result unreadable: {e}")
            continue
        try:
            exp = con.sql(sql)
            exp_cols = sorted(exp.columns)
            exp_rows = sorted(
                tuple(canon(v) for v in row)
                for row in con.sql(
                    f"SELECT {', '.join(exp_cols)} FROM exp").fetchall())
        except Exception as e:
            print(f"FAIL {name}: oracle sql error: {e}")
            continue
        if got_cols != exp_cols:
            print(f"FAIL {name}: columns {got_cols} != {exp_cols}")
        elif got_rows != exp_rows:
            diff_a = [r for r in got_rows if r not in set(exp_rows)][:3]
            diff_b = [r for r in exp_rows if r not in set(got_rows)][:3]
            print(f"FAIL {name}: {len(got_rows)} vs {len(exp_rows)} rows; "
                  f"spark-only={diff_a} oracle-only={diff_b}")
        else:
            n_ok += 1
            print(f"OK   {name} ({len(got_rows)} rows)")
    n_run = len([k for k in oracle if k not in skip])
    tail = f" ({len(oracle) - n_run} skipped)" if skip else ""
    print(f"-- {n_ok}/{n_run} queries match{tail}")


if __name__ == "__main__":
    main()
