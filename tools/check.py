#!/usr/bin/env python3
"""Dev-only harness mimicking the driver's t2 gate: compare Verify.scala's
parquet dumps against DuckDB running SparkEntry.oracleSql over the same
tables. Strictest plausible comparison: row count, column names (sorted),
dtypes-compatible values, exact cell equality in row order.

Usage: python3 tools/check.py <sfDir> <outDir> [query ...]
"""
import sys, os, json, glob
import duckdb
import pyarrow.parquet as pq

TABLES = ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]

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
        spark_tbl = pq.read_table(files[0])
        if name not in oracle:
            print(f"ROWS  {name}: {spark_tbl.num_rows} rows (no oracle)"); n_noracle += 1; continue
        try:
            duck = con.execute(oracle[name]).fetch_arrow_table()
        except Exception as e:
            print(f"OERR  {name}: oracle failed: {str(e)[:160]}"); n_fail += 1; fails.append(name); continue
        # column names (order-insensitive, like the driver's sort-by-name)
        sc, dc = sorted(spark_tbl.column_names), sorted(duck.column_names)
        if sc != dc:
            print(f"COLS  {name}: spark={sc} duck={dc}"); n_fail += 1; fails.append(name); continue
        if spark_tbl.num_rows != duck.num_rows:
            print(f"NROW  {name}: spark={spark_tbl.num_rows} duck={duck.num_rows}"); n_fail += 1; fails.append(name); continue
        ok = True
        for cname in sc:
            a = spark_tbl.column(cname).to_pylist()
            b = duck.column(cname).to_pylist()
            st = str(spark_tbl.schema.field(cname).type)
            dt = str(duck.schema.field(cname).type)
            if st != dt:
                print(f"TYPE  {name}.{cname}: spark={st} duck={dt}")
                ok = False
            for i, (x, y) in enumerate(zip(a, b)):
                if x != y:
                    print(f"VAL   {name}.{cname}[{i}]: spark={x!r} duck={y!r}")
                    ok = False; break
            if not ok: break
        if ok:
            print(f"PASS  {name}: {spark_tbl.num_rows} rows"); n_pass += 1
        else:
            n_fail += 1; fails.append(name)
    print(f"\n== {n_pass} pass, {n_fail} fail, {n_noracle} rows-only ==")
    if fails: print("failing:", " ".join(fails))
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
