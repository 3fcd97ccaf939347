#!/usr/bin/env python3
"""Scan every oracle SQL for negative-zero emissions.

The engine side canonicalizes -0.0 at emission (FixedPoint.canonEmit,
asserted by NegZeroSpec); this scanner finds the oracle half of the
contract: any DuckDB oracle whose result contains a -0.0 would hash-red
against the canonicalized Spark dump, so its SQL needs a `+ 0.0` on the
offending output. Run after changing oracles or regenerating testdata:

    python3 tools/negzero_scan.py /tmp/graft_verify_r8/oracle_sql.json \
        /root/testdata/sf0.001 /root/testdata/sf0.01 /root/testdata/sf0.1
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def has_negzero(v):
    if isinstance(v, float):
        return v == 0.0 and math.copysign(1.0, v) < 0
    if isinstance(v, (list, tuple)):
        return any(has_negzero(x) for x in v)
    if isinstance(v, dict):
        return any(has_negzero(x) for x in v.values())
    return False


def main():
    oracle_path = sys.argv[1]
    sfdirs = sys.argv[2:] or ["/root/testdata/sf0.01"]
    oracle = json.load(open(oracle_path))
    hits = {}
    for sfdir in sfdirs:
        con = duckdb.connect()
        for t in TABLES:
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                        f"read_parquet('{sfdir}/{t}.parquet')")
        for name, sql in sorted(oracle.items()):
            try:
                rows = con.sql(sql).fetchall()
            except Exception as e:
                print(f"SKIP {name} @{sfdir}: {str(e).splitlines()[0][:120]}")
                continue
            bad = [r for r in rows if any(has_negzero(v) for v in r)]
            if bad:
                hits.setdefault(name, []).append((sfdir, len(bad), bad[0]))
                print(f"NEGZERO {name} @{sfdir}: {len(bad)} rows, e.g. {bad[0]}")
        con.close()
    print(f"-- {len(hits)} oracles emit -0.0: {sorted(hits)}")


if __name__ == "__main__":
    main()
