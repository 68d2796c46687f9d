#!/usr/bin/env python3
"""Local mirror of the driver's t2 correctness gate: run graft.Verify at a
given SF, then execute each oracle SQL in DuckDB over the same parquet
tables and compare (row count, sorted-column value hash).

Usage: python3 tools/check_oracle.py [sfDir] [outDir]
(dev tool only — the engine itself never depends on DuckDB/pandas.)
"""
import json, sys, hashlib
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def canon(v):
    # Mirrors the driver's canonicalization: values arrive through the
    # arrow/pandas path (so DuckDB HUGEINT becomes float64 and renders
    # "60000.0", exposing integer-sum typing mismatches), no rounding.
    if v is None or (isinstance(v, float) and v != v):
        return "NULL"
    try:
        if pd.isna(v):
            return "NULL"
    except (TypeError, ValueError):
        pass  # arrays/lists — fall through to str
    if isinstance(v, (bool,)) or type(v).__name__ == "bool_":
        return "true" if bool(v) else "false"
    if isinstance(v, float):
        return repr(v)
    return str(v)

def fetch_pandas(rel):
    """Fetch through pandas (the driver's path) so type coercions like
    HUGEINT->float64 are visible, unlike fetchall()'s Python ints."""
    df = rel.fetchdf()
    cols = list(df.columns)
    rows = [tuple(row) for row in df.itertuples(index=False, name=None)]
    return cols, rows

def table_hash(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("|".join(canon(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for ln in lines:
        h.update(ln.encode())
        h.update(b"\n")
    return h.hexdigest()

def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_verify"
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    ok = fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            spark_cols, spark_rows = fetch_pandas(con.execute(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'"))
        except Exception as e:
            print(f"FAIL {name}: spark output unreadable: {e}")
            fail += 1
            continue
        try:
            duck_cols, duck_rows = fetch_pandas(con.execute(sql))
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            fail += 1
            continue
        if sorted(spark_cols) != sorted(duck_cols):
            print(f"FAIL {name}: columns {sorted(spark_cols)} != {sorted(duck_cols)}")
            fail += 1
            continue
        if len(spark_rows) != len(duck_rows):
            print(f"FAIL {name}: rows {len(spark_rows)} != {len(duck_rows)}")
            fail += 1
            continue
        hs, hd = table_hash(spark_rows, spark_cols), table_hash(duck_rows, duck_cols)
        if hs != hd:
            print(f"FAIL {name}: hash mismatch ({len(spark_rows)} rows)")
            # show first differing line for debugging
            order_s = sorted(range(len(spark_cols)), key=lambda i: spark_cols[i])
            order_d = sorted(range(len(duck_cols)), key=lambda i: duck_cols[i])
            ls = sorted("|".join(canon(r[i]) for i in order_s) for r in spark_rows)
            ld = sorted("|".join(canon(r[i]) for i in order_d) for r in duck_rows)
            for a, b in zip(ls, ld):
                if a != b:
                    print(f"  spark: {a}\n  duck : {b}")
                    break
            fail += 1
        else:
            print(f"OK   {name} ({len(spark_rows)} rows)")
            ok += 1
    print(f"\n{ok} ok, {fail} failed")
    sys.exit(1 if fail else 0)

if __name__ == "__main__":
    main()
