#!/usr/bin/env python3
"""Local stand-in for the driver's t2 correctness gate: run each
oracle_sql.json query in DuckDB over the same parquet tables and compare
with the Spark result parquet (column-name-sorted, value-hash compare).

Usage: python3 tools/check.py <sfDir> <outDir>
(Driver-side tooling only — not part of the Scala library.)
"""
import sys, json, glob, os
import duckdb
import pandas as pd

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    # normalize datetimes to ns for cross-engine compare
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = df[c].astype("datetime64[ns]")
    return df.reset_index(drop=True)

def main(sf_dir, out_dir):
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.isdir(p):  # Spark-written table dir (probe fixtures)
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}/*.parquet'")
        elif os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    n_pass = n_fail = n_noracle = 0
    # union of oracle keys, the full registry (queries.json, written by
    # Verify), and produced q_* dirs: a query whose Spark run threw before
    # writing must FAIL, not vanish
    dirs = {os.path.basename(d): d
            for d in glob.glob(os.path.join(out_dir, "q_*"))}
    reg_path = os.path.join(out_dir, "queries.json")
    registry = set(json.load(open(reg_path))) if os.path.exists(reg_path) else set()
    for name in sorted(set(oracle) | set(dirs) | registry):
        qdir = dirs.get(name)
        files = glob.glob(os.path.join(qdir, "*.parquet")) if qdir else []
        if not files:
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        spark_df = canon(pd.concat([pd.read_parquet(f) for f in sorted(files)]))
        if name not in oracle:
            print(f"---- {name}: no oracle (rows={len(spark_df)})"); n_noracle += 1
            continue
        try:
            duck_df = canon(con.execute(oracle[name]).fetchdf())
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}"); n_fail += 1; continue
        ok_schema = list(spark_df.columns) == list(duck_df.columns)
        ok_rows = len(spark_df) == len(duck_df)
        # the driver's hash is dtype- and bit-exact: an int64 Spark column
        # vs a float64 oracle column (DuckDB sum(BIGINT)->HUGEINT) hashes
        # differently even when every value is numerically equal, and any
        # last-ulp double drift fails it. Mirror that strictness here.
        # full-dtype compare (not just .kind): the driver's hash is
        # dtype-exact, so int32 vs int64 — same kind 'i' — still differs
        # there; canon() already normalized datetimes to ns on both sides
        ok_kinds = ok_schema and all(
            spark_df[c].dtype == duck_df[c].dtype
            for c in spark_df.columns)
        ok_vals = False
        if ok_schema and ok_rows:
            try:
                pd.testing.assert_frame_equal(spark_df, duck_df,
                    check_dtype=False, check_exact=True)
                ok_vals = True
            except AssertionError as e:
                msg = str(e).split("\n")[0:3]
        if ok_vals and not ok_kinds:
            bad = [f"{c}:{spark_df[c].dtype}!={duck_df[c].dtype}"
                   for c in spark_df.columns
                   if spark_df[c].dtype != duck_df[c].dtype]
            msg = ["dtype mismatch (driver hash would differ): "
                   + ", ".join(bad)]
            ok_vals = False
        if ok_schema and ok_rows and ok_vals:
            print(f"PASS {name} (rows={len(spark_df)})"); n_pass += 1
        else:
            print(f"FAIL {name}: schema_ok={ok_schema} rows {len(spark_df)} vs {len(duck_df)}")
            if not ok_schema:
                print(f"     spark cols: {list(spark_df.columns)}")
                print(f"     duck  cols: {list(duck_df.columns)}")
            elif ok_rows and not ok_vals:
                print("     " + " | ".join(msg))
            n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_noracle} rows-only")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
