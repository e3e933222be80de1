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

def main():
    args = [a for a in sys.argv[1:]]
    json_out = only = None
    if "--json" in args:
        i = args.index("--json"); json_out = args[i + 1]; del args[i:i + 2]
    if "--only" in args:
        i = args.index("--only"); only = set(args[i + 1].split(",")); del args[i:i + 2]
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
        spark_dir = f"{out}/{name}"
        files = glob.glob(f"{spark_dir}/*.parquet")
        if not files:
            results[name] = "NO_SPARK_OUTPUT"; n_fail += 1
            jrows[name] = {"rows_match": False, "schema_match": False,
                           "hash_match": False, "err": "no_spark_output"}
            continue
        try:
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
