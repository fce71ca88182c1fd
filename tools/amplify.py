#!/usr/bin/env python3
"""Driver-side tool: amplify an sf-dir by unioning K key-shifted copies.

Usage: python3 tools/amplify.py <srcdir> <dstdir> <K>

Purpose: the integer-overflow stress gate (OverflowAuditSpec /
CORRECTNESS_sf1) needs a scale factor the driver does not generate.
Each fact table is replicated K times with every key column shifted by
copy_index * (max_key + 1), so joins stay consistent, keys stay unique,
and every n-scaling aggregate grows exactly K-fold. Values, timestamps
and text are left bit-identical — tie multiplicities grow K-fold too,
which is precisely the stress the rank/tie-correction arithmetic needs.
Dimension tables (region, nation) copy as-is.

Name/text uniqueness: copies i>0 suffix c_name/s_name/p_name with
"_c<i>" and document text with " copy<i>" (n_chars adjusted) — several
oracles depend on fixture properties the raw duplication would break
(s_name uniqueness under a LIMIT tie-break; "natural full-text dup <= 2"
in the boilerplate-strip claim). Suffixes sit at the END, so
leading-token parses and contains-style filters behave identically in
every copy.
"""
import os
import sys

import duckdb


def main(src, dst, k):
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()

    def span(t, c):
        return con.sql(
            f"SELECT max({c}) + 1 FROM '{src}/{t}.parquet'").fetchone()[0]

    cu = span("customer", "c_custkey")
    su = span("supplier", "s_suppkey")
    pa = span("part", "p_partkey")
    orr = span("orders", "o_orderkey")
    ev = span("events", "event_id")
    usr = span("events", "user_id")
    do = span("documents", "doc_id")
    ve = span("embeddings", "vec_id")

    def emit(table, select_for):
        union = " UNION ALL ".join(select_for(i) for i in range(k))
        con.sql(f"COPY ({union}) TO '{dst}/{table}.parquet'"
                " (FORMAT PARQUET)")
        n = con.sql(f"SELECT count(*) FROM '{dst}/{table}.parquet'"
                    ).fetchone()[0]
        print(f"{table}: {n} rows")

    for t in ("region", "nation"):
        con.sql(f"COPY (SELECT * FROM '{src}/{t}.parquet') TO"
                f" '{dst}/{t}.parquet' (FORMAT PARQUET)")
        print(f"{t}: copied")

    def sfx(col, i, sep="_c"):
        return col if i == 0 else f"{col} || '{sep}{i}'"

    emit("customer",
         lambda i: f"SELECT c_custkey + {i} * {cu} AS c_custkey,"
         f" {sfx('c_name', i)} AS c_name, c_nationkey,"
         f" c_acctbal, c_mktsegment FROM '{src}/customer.parquet'")
    emit("supplier",
         lambda i: f"SELECT s_suppkey + {i} * {su} AS s_suppkey,"
         f" {sfx('s_name', i)} AS s_name, s_nationkey,"
         f" s_acctbal FROM '{src}/supplier.parquet'")
    emit("part",
         lambda i: f"SELECT p_partkey + {i} * {pa} AS p_partkey,"
         f" {sfx('p_name', i)} AS p_name, p_brand,"
         f" p_type, p_size, p_retailprice FROM '{src}/part.parquet'")
    emit("orders",
         lambda i: f"SELECT o_orderkey + {i} * {orr} AS o_orderkey,"
         f" o_custkey + {i} * {cu} AS o_custkey, o_orderstatus, o_totalprice,"
         f" o_orderdate, o_orderpriority FROM '{src}/orders.parquet'")
    emit("lineitem",
         lambda i: f"SELECT l_orderkey + {i} * {orr} AS l_orderkey,"
         f" l_partkey + {i} * {pa} AS l_partkey,"
         f" l_suppkey + {i} * {su} AS l_suppkey, l_linenumber, l_quantity,"
         f" l_extendedprice, l_discount, l_tax, l_returnflag, l_linestatus,"
         f" l_shipdate FROM '{src}/lineitem.parquet'")
    emit("events",
         lambda i: f"SELECT event_id + {i} * {ev} AS event_id, ts,"
         f" user_id + {i} * {usr} AS user_id, event_type, value, props"
         f" FROM '{src}/events.parquet'")
    emit("documents",
         lambda i: f"SELECT doc_id + {i} * {do} AS doc_id,"
         f" {sfx('text', i, sep=' copy')} AS text, lang, source,"
         f" n_chars + {0 if i == 0 else len(' copy') + len(str(i))}"
         f" AS n_chars FROM '{src}/documents.parquet'")
    emit("embeddings",
         lambda i: f"SELECT vec_id + {i} * {ve} AS vec_id, embedding, label"
         f" FROM '{src}/embeddings.parquet'")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], int(sys.argv[3]))
