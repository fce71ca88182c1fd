#!/usr/bin/env python3
"""Subset oracle compare for the dev loop (driver-side tooling only).

Usage: python3 tools/checkq.py <sfdir> <outdir> <query> [query...]

Run `sbt "runMain graft.Verify <sfdir> <outdir> q1 q2"` first; this
replays only the named oracles against the dumped results, with the
same canonical hash as tools/check.py.
"""
import json
import os
import sys

import duckdb

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from check import TABLES, compare_one  # noqa: E402


def main(sfdir, outdir, names):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    n_fail = 0
    for name in names:
        if name not in oracle:
            print(f"WARN {name}: no SQL oracle (rows-only)")
            try:
                got = con.sql(f"SELECT * FROM '{outdir}/{name}/*.parquet'")
                rows = got.fetchall()
                cols = [c.lower() for c in got.columns]
                if cols == ["_verify_error"]:
                    print(f"FAIL {name}: _verify_error sentinel: {rows[:1]}")
                    n_fail += 1
                else:
                    print(f"  rows={len(rows)} sample={rows[:3]}")
            except Exception as e:
                print(f"FAIL {name}: {e}")
                n_fail += 1
            continue
        if not compare_one(con, outdir, name, oracle[name]):
            n_fail += 1
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], sys.argv[3:])
