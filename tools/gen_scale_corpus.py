#!/usr/bin/env python3
"""Generate a ~10x scale corpus from sf0.1 for the scale-correctness gate
(round-9 review item 2): every table is replicated K times with
key-space shifts that preserve PK uniqueness and FK consistency, so the
registry queries and their DuckDB oracles both run unchanged on a corpus
an order of magnitude past the largest driver-provided SF.

Shifts per copy i (offset unit = max(key)+1 of the base table):
  documents   doc_id+i*U; copy>0 text gets a ' copy<i>' suffix and
              n_chars recomputed (keeps the n_chars==length(text)
              consistency invariant while making texts near- rather
              than exact-duplicates across copies)
  embeddings  vec_id+i*U (vectors repeat; ties break on vec_id)
  events      event_id+i*U, user_id+i*U (10x users, same time window)
  customer/part/supplier/orders  key+i*U, orders.o_custkey follows the
              customer shift
  lineitem    l_orderkey/l_partkey/l_suppkey follow their parents
  region/nation  copied once (dimension tables, FK'd by value)

Usage: python3 tools/gen_scale_corpus.py [K] [src] [dst]
Defaults: 10 /root/testdata/sf0.1 /tmp/graft-sf1
"""
import os, sys
import duckdb


def main():
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    src = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    dst = sys.argv[3] if len(sys.argv) > 3 else "/tmp/graft-sf1"
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW copies AS SELECT unnest(range({k})) AS i")

    def u(table, key):
        return con.sql(
            f"SELECT max({key}) + 1 FROM read_parquet('{src}/{table}.parquet')"
        ).fetchone()[0]

    def gen(table, select):
        out = f"{dst}/{table}.parquet"
        con.execute(
            f"COPY (SELECT {select} FROM read_parquet('{src}/{table}.parquet') "
            f"CROSS JOIN copies ORDER BY i) TO '{out}' (FORMAT PARQUET)")
        n = con.sql(f"SELECT count(*) FROM read_parquet('{out}')").fetchone()[0]
        print(f"  {table}: {n} rows")

    for t in ("region", "nation"):
        con.execute(
            f"COPY (SELECT * FROM read_parquet('{src}/{t}.parquet')) "
            f"TO '{dst}/{t}.parquet' (FORMAT PARQUET)")
        print(f"  {t}: copied")

    ud, ue, uv = u("documents", "doc_id"), u("events", "event_id"), u("embeddings", "vec_id")
    uu = u("events", "user_id")
    uc, up, us, uo = (u("customer", "c_custkey"), u("part", "p_partkey"),
                      u("supplier", "s_suppkey"), u("orders", "o_orderkey"))

    gen("documents",
        f"doc_id + i*{ud} AS doc_id, "
        "CASE WHEN i = 0 THEN text ELSE text || ' copy' || i END AS text, "
        "lang, source, "
        "CAST(CASE WHEN i = 0 THEN n_chars "
        "ELSE length(text || ' copy' || i) END AS BIGINT) AS n_chars")
    gen("embeddings", f"vec_id + i*{uv} AS vec_id, embedding, label")
    gen("events",
        f"event_id + i*{ue} AS event_id, ts, user_id + i*{uu} AS user_id, "
        "event_type, value, props")
    gen("customer",
        f"c_custkey + i*{uc} AS c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment")
    gen("part",
        f"p_partkey + i*{up} AS p_partkey, p_name, p_brand, p_type, p_size, p_retailprice")
    gen("supplier",
        f"s_suppkey + i*{us} AS s_suppkey, s_name, s_nationkey, s_acctbal")
    gen("orders",
        f"o_orderkey + i*{uo} AS o_orderkey, o_custkey + i*{uc} AS o_custkey, "
        "o_orderstatus, o_totalprice, o_orderdate, o_orderpriority")
    gen("lineitem",
        f"l_orderkey + i*{uo} AS l_orderkey, l_partkey + i*{up} AS l_partkey, "
        f"l_suppkey + i*{us} AS l_suppkey, l_linenumber, l_quantity, "
        "l_extendedprice, l_discount, l_tax, l_returnflag, l_linestatus, l_shipdate")
    print(f"wrote {dst} (x{k} of {src})")


if __name__ == "__main__":
    main()
