#!/usr/bin/env python3
"""Dev-only harness mimicking the driver's t2 gate: compare Verify.scala's
parquet dumps against DuckDB running SparkEntry.oracleSql over the same
tables, the way the DRIVER does it — both sides converted to pandas,
rows sorted, every cell STRINGIFIED, strings compared. Round-1 lesson
(VERDICT.md "What's wrong" #1): comparing raw values (Decimal == float)
hides rendering mismatches the driver's stringify-then-hash sees, e.g.
Spark Decimal '39301199.20' vs DuckDB float64 '39301199.2'.

Usage: python3 tools/check.py <sfDir> <outDir> [query ...]
"""
import sys, os, json, glob
import duckdb
import pandas as pd

TABLES = ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]

def canon(df: pd.DataFrame) -> pd.DataFrame:
    """Driver-style canonical form: columns sorted by name, rows sorted by
    every column, each cell rendered with str()."""
    cols = sorted(df.columns)
    df = df[cols]
    if len(df):
        df = df.sort_values(by=cols, kind="mergesort").reset_index(drop=True)
    return df.astype(str)

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    n_pass = n_fail = n_noracle = 0
    fails = []
    for qdir in sorted(glob.glob(os.path.join(out_dir, "*"))):
        name = os.path.basename(qdir)
        if not os.path.isdir(qdir): continue
        if only and name not in only: continue
        files = glob.glob(os.path.join(qdir, "*.parquet"))
        if not files:
            print(f"MISS  {name}: no parquet output"); n_fail += 1; fails.append(name); continue
        try:
            spark_df = pd.read_parquet(qdir)
        except Exception as e:
            print(f"SERR  {name}: spark read failed: {str(e)[:160]}"); n_fail += 1; fails.append(name); continue
        if name not in oracle:
            # driver still sorts rows for its rows-only record: an unsortable
            # (array/binary) column crashes the harness — fail loudly here.
            try:
                canon(spark_df)
            except Exception as e:
                print(f"SORT  {name}: driver-sort would crash: {str(e)[:120]}")
                n_fail += 1; fails.append(name); continue
            print(f"ROWS  {name}: {len(spark_df)} rows (no oracle)"); n_noracle += 1; continue
        try:
            duck_df = con.execute(oracle[name]).df()
        except Exception as e:
            print(f"OERR  {name}: oracle failed: {str(e)[:160]}"); n_fail += 1; fails.append(name); continue
        sc, dc = sorted(spark_df.columns), sorted(duck_df.columns)
        if list(sc) != list(dc):
            print(f"COLS  {name}: spark={sc} duck={dc}"); n_fail += 1; fails.append(name); continue
        if len(spark_df) != len(duck_df):
            print(f"NROW  {name}: spark={len(spark_df)} duck={len(duck_df)}"); n_fail += 1; fails.append(name); continue
        try:
            a, b = canon(spark_df), canon(duck_df)
        except Exception as e:
            print(f"SORT  {name}: {str(e)[:160]}"); n_fail += 1; fails.append(name); continue
        if a.equals(b):
            print(f"PASS  {name}: {len(a)} rows"); n_pass += 1
        else:
            shown = 0
            for cname in a.columns:
                neq = a[cname] != b[cname]
                if neq.any():
                    i = int(neq.idxmax())
                    print(f"VAL   {name}.{cname}[{i}]: spark={a[cname][i]!r} duck={b[cname][i]!r}")
                    shown += 1
                    if shown >= 3: break
            n_fail += 1; fails.append(name)
    print(f"\n== {n_pass} pass, {n_fail} fail, {n_noracle} rows-only ==")
    if fails: print("failing:", " ".join(fails))
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
