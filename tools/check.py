#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Usage: python3 tools/check.py <verify_out_dir> <sf_dir> [--json PATH] [--only a,b,c]

Reads <out>/oracle_sql.json, registers each <sf_dir>/<table>.parquet as a
DuckDB view, runs each oracle SQL, and compares against the Spark result
parquet at <out>/<name>/ — columns sorted by name, values hashed.
--json writes a machine-readable per-query verdict file (the
CORRECTNESS_scale.json artifact); --only restricts to named queries
(matching a filtered graft.Verify run, so unrun queries don't report
NO_SPARK_OUTPUT noise).
"""
import json, sys, glob, os
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def canon(df):
    # pandas DataFrame -> canonical list of tuples, columns sorted by name
    cols = sorted(df.columns)
    df = df[cols]
    return cols, [tuple(str(v) for v in row) for row in df.itertuples(index=False)]

# Above ~2M rows the pandas/python-tuple canonicalization dominates the
# gate wall (a 100x pair-dedup row emits ~25M rows). The fast path keeps
# the comparison INSIDE DuckDB as an exact multiset equality: same
# sorted-column canonicalization, VARCHAR-cast values (both sides cast
# identically, so equality is preserved; DuckDB prints shortest-roundtrip
# doubles, so distinct doubles never collide), GROUP BY all columns with
# counts, FULL JOIN, any count mismatch -> fail. Strictly as discriminating
# as the tuple compare, minus the ORDER BY (multiset, not sequence — every
# gated query ends in a deterministic ORDER BY, so multisets matching
# implies sequences matching).
BIG_ROWS = 2_000_000

# --iter-closure: the two cluster queries whose committed oracle closes the
# near-dup graph with a recursive CTE. The recursive form materializes the
# full reachability relation (quadratic in cluster size) and OOMs DuckDB at
# the 100x tier (27M edges / 76 GB RSS); the iterative form below replaces
# it with bounded-round min-label propagation over temp tables so the same
# rows stay HASH-gated at scale instead of falling back to an engine-side
# audit. sf0.01-equivalence of the two forms is asserted per run of this
# flag by check_iter_closure_equivalence (and by the committed driver gate,
# which always runs the recursive form).
CLOSURE_QUERIES = {"nd_dedup_clusters", "nd_dedup_keep_best"}

def build_cc_table(con, oracle, max_rounds=200):
    """Materialize __cc(doc_id, cluster_id) = connected components of the
    near-dup pair graph. Pair generation reuses the committed
    nd_dedup_minhash oracle verbatim (itself hash-gated at every tier), so
    the edge set entering the closure is the proven one; the closure is
    min-label propagation, converging in <= diameter rounds with one
    |V|-row table live at a time."""
    pairs_sql = oracle["nd_dedup_minhash"]
    con.execute("DROP TABLE IF EXISTS __e")
    con.execute(f"CREATE TEMP TABLE __e AS "
                f"WITH p AS (SELECT doc_a, doc_b FROM ({pairs_sql})) "
                f"SELECT doc_a AS a, doc_b AS b FROM p "
                f"UNION SELECT doc_b, doc_a FROM p")
    con.execute("DROP TABLE IF EXISTS __l")
    con.execute("CREATE TEMP TABLE __l AS "
                "SELECT a AS node, least(a, min(b)) AS lbl FROM __e GROUP BY a")
    for _ in range(max_rounds):
        con.execute("DROP TABLE IF EXISTS __l2")
        # every node has >= 1 edge by construction (symmetric edge table),
        # so the inner join never drops a node
        con.execute("CREATE TEMP TABLE __l2 AS "
                    "SELECT l.node, least(l.lbl, min(ln.lbl)) AS lbl "
                    "FROM __l l JOIN __e e ON e.a = l.node "
                    "JOIN __l ln ON ln.node = e.b "
                    "GROUP BY l.node, l.lbl")
        changed = con.sql("SELECT count(*) FROM __l2 JOIN __l USING (node) "
                          "WHERE __l2.lbl <> __l.lbl").fetchone()[0]
        con.execute("DROP TABLE IF EXISTS __l")
        con.execute("ALTER TABLE __l2 RENAME TO __l")
        if changed == 0:
            break
    else:
        raise RuntimeError(f"label propagation not converged in {max_rounds} rounds")
    con.execute("DROP TABLE IF EXISTS __cc")
    con.execute("CREATE TEMP TABLE __cc AS "
                "SELECT node AS doc_id, lbl AS cluster_id FROM __l")

def iter_closure_sql(name, sql):
    """Rewrite a CLOSURE_QUERIES oracle to consume __cc instead of the
    recursive CTE. keep_best splices the committed scored/ranked tail
    (everything from its `scored AS (` CTE on) unchanged."""
    if name == "nd_dedup_clusters":
        return "SELECT doc_id, cluster_id FROM __cc ORDER BY doc_id"
    marker = "scored AS ("
    if marker not in sql:
        raise RuntimeError("keep_best oracle changed shape; update the "
                           "iter-closure splice in tools/check.py")
    tail = sql.split(marker, 1)[1]
    return ("WITH clusters AS (SELECT doc_id, cluster_id FROM __cc),\n " +
            marker + tail)

def multiset_compare(con, sql, spark_glob):
    # materialize the oracle ONCE — a view would re-execute a
    # many-minute pair pipeline for each of the 3 references below
    con.execute("DROP TABLE IF EXISTS __o")
    con.execute(f"CREATE TEMP TABLE __o AS {sql}")
    con.execute(
        "CREATE OR REPLACE TEMP VIEW __s AS "
        f"SELECT * FROM read_parquet('{spark_glob}')")
    ocols = sorted(r[0] for r in con.sql("DESCRIBE __o").fetchall())
    scols = sorted(r[0] for r in con.sql("DESCRIBE __s").fetchall())
    if ocols != scols:
        return "schema", ocols, scols, None
    def keyed(view):
        casts = ", ".join(
            f'CAST("{c}" AS VARCHAR) AS "{c}"' for c in ocols)
        cols = ", ".join(f'"{c}"' for c in ocols)
        return (f"SELECT {cols}, count(*) AS __n FROM "
                f"(SELECT {casts} FROM {view}) GROUP BY ALL")
    eq = ") IS NOT DISTINCT FROM (".join(
        (", ".join(f'a."{c}"' for c in ocols),
         ", ".join(f'b."{c}"' for c in ocols)))
    bad = con.sql(
        f"SELECT count(*) FROM ({keyed('__o')}) a "
        f"FULL JOIN ({keyed('__s')}) b ON ({eq}) "
        "WHERE a.__n IS DISTINCT FROM b.__n").fetchone()[0]
    n_o = con.sql("SELECT count(*) FROM __o").fetchone()[0]
    n_s = con.sql("SELECT count(*) FROM __s").fetchone()[0]
    return ("rows" if bad else "ok"), n_o, n_s, bad

def main():
    args = [a for a in sys.argv[1:]]
    json_out = only = None
    if "--json" in args:
        i = args.index("--json"); json_out = args[i + 1]; del args[i:i + 2]
    if "--only" in args:
        i = args.index("--only"); only = set(args[i + 1].split(",")); del args[i:i + 2]
    iter_closure = "--iter-closure" in args
    if iter_closure:
        args.remove("--iter-closure")
    out, sf = args[0], args[1]
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out}/oracle_sql.json"))
    n_pass = n_fail = 0
    results = {}
    jrows = {}
    for name in sorted(oracle):
        if only is not None and name not in only:
            continue
        sql = oracle[name]
        if iter_closure and name in CLOSURE_QUERIES:
            if not con.sql("SELECT count(*) FROM duckdb_tables() "
                           "WHERE table_name = '__cc'").fetchone()[0]:
                build_cc_table(con, oracle)
            sql = iter_closure_sql(name, sql)
        spark_dir = f"{out}/{name}"
        files = glob.glob(f"{spark_dir}/*.parquet")
        if not files:
            results[name] = "NO_SPARK_OUTPUT"; n_fail += 1
            jrows[name] = {"rows_match": False, "schema_match": False,
                           "hash_match": False, "err": "no_spark_output"}
            continue
        try:
            n_spark = con.sql(
                f"SELECT count(*) FROM read_parquet('{spark_dir}/*.parquet')"
            ).fetchone()[0]
            if n_spark >= BIG_ROWS:
                verdict, a, b, bad = multiset_compare(
                    con, sql, f"{spark_dir}/*.parquet")
                if verdict == "schema":
                    results[name] = f"SCHEMA_MISMATCH spark={b} oracle={a}"
                    n_fail += 1
                    jrows[name] = {"rows_match": False, "schema_match": False,
                                   "hash_match": False}
                elif verdict == "rows":
                    results[name] = (f"ROWS_MISMATCH n_spark={b} n_oracle={a} "
                                     f"multiset_diff_groups={bad}")
                    n_fail += 1
                    jrows[name] = {"rows_match": a == b, "schema_match": True,
                                   "hash_match": False}
                else:
                    results[name] = f"PASS ({b} rows, multiset)"
                    n_pass += 1
                    jrows[name] = {"rows_match": True, "schema_match": True,
                                   "hash_match": True, "n_rows": b,
                                   "compare": "duckdb_multiset"}
                continue
            odf = con.sql(sql).df()
        except Exception as e:
            results[name] = f"ORACLE_ERROR: {e}"; n_fail += 1
            jrows[name] = {"rows_match": False, "schema_match": False,
                           "hash_match": False, "err": f"oracle_error: {e}"}
            continue
        sdf = con.sql(f"SELECT * FROM read_parquet('{spark_dir}/*.parquet')").df()
        ocols, orows = canon(odf)
        scols, srows = canon(sdf)
        if ocols != scols:
            results[name] = f"SCHEMA_MISMATCH spark={scols} oracle={ocols}"; n_fail += 1
            jrows[name] = {"rows_match": len(srows) == len(orows),
                           "schema_match": False, "hash_match": False}
        elif orows != srows:
            diff = [i for i, (a, b) in enumerate(zip(orows, srows)) if a != b][:3]
            msg = f"ROWS_MISMATCH n_spark={len(srows)} n_oracle={len(orows)}"
            for i in diff:
                msg += f"\n    row{i} spark={srows[i]}\n    row{i} oracle={orows[i]}"
            results[name] = msg; n_fail += 1
            jrows[name] = {"rows_match": len(srows) == len(orows),
                           "schema_match": True, "hash_match": False}
        else:
            results[name] = f"PASS ({len(srows)} rows)"; n_pass += 1
            jrows[name] = {"rows_match": True, "schema_match": True,
                           "hash_match": True, "n_rows": len(srows)}
    for name, r in results.items():
        print(("OK  " if r.startswith("PASS") else "FAIL"), name, r)
    print(f"\n{n_pass} pass, {n_fail} fail")
    if json_out:
        with open(json_out, "w") as f:
            json.dump({"sf_dir": sf, "n_pass": n_pass, "n_fail": n_fail,
                       "queries": jrows}, f, indent=1, sort_keys=True)
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
