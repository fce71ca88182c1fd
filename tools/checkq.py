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
from check import TABLES, canon  # noqa: E402


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
        try:
            got = con.sql(f"SELECT * FROM '{outdir}/{name}/*.parquet'")
            grows, gcols = got.fetchall(), [c.lower() for c in got.columns]
            exp = con.sql(oracle[name])
            erows, ecols = exp.fetchall(), [c.lower() for c in exp.columns]
        except Exception as e:
            print(f"FAIL {name}: exception {e}")
            n_fail += 1
            continue
        if sorted(gcols) != sorted(ecols):
            print(f"FAIL {name}: cols spark={sorted(gcols)} oracle={sorted(ecols)}")
            n_fail += 1
            continue
        gtypes = {c.lower(): str(t) for c, t in zip(got.columns, got.types)}
        etypes = {c.lower(): str(t) for c, t in zip(exp.columns, exp.types)}
        tmis = {c: (gtypes[c], etypes[c]) for c in gtypes if gtypes[c] != etypes[c]}
        if tmis:
            print(f"WARN {name}: dtype mismatch {tmis}")
        gh, gn = canon(grows, gcols)
        eh, en = canon(erows, ecols)
        if gn != en:
            print(f"FAIL {name}: rowcount spark={gn} oracle={en}")
            n_fail += 1
        elif gh != eh:
            print(f"FAIL {name}: hash mismatch ({gn} rows)")
            gs = set(tuple(map(repr, r)) for r in grows)
            es = set(tuple(map(repr, r)) for r in erows)
            for r in list(gs - es)[:3]:
                print(f"  spark-only: {r}")
            for r in list(es - gs)[:3]:
                print(f"  oracle-only: {r}")
            n_fail += 1
        else:
            print(f"PASS {name} ({gn} rows)")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], sys.argv[3:])
