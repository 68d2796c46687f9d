#!/usr/bin/env python3
"""Local mirror of the driver's t2 correctness gate: run graft.Verify at a
given SF, then execute each oracle SQL in DuckDB over the same parquet
tables and compare (row count, sorted-column value hash).

Usage: python3 tools/check_oracle.py [sfDir] [outDir]
(dev tool only — the engine itself never depends on DuckDB/pandas.)
"""
import json, sys, hashlib
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def canon(v):
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        return repr(round(v, 9))
    return str(v)

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
            spark_rel = con.execute(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            spark_cols = [d[0] for d in spark_rel.description]
            spark_rows = spark_rel.fetchall()
        except Exception as e:
            print(f"FAIL {name}: spark output unreadable: {e}")
            fail += 1
            continue
        try:
            duck_rel = con.execute(sql)
            duck_cols = [d[0] for d in duck_rel.description]
            duck_rows = duck_rel.fetchall()
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
