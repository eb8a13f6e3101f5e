#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run SparkEntry.oracleSql
in DuckDB over the sf tables and compare with the Spark parquet dumps that
graft.Verify wrote. Compares schema (column names sorted), row count, and
values both in-order and as sorted multisets.

Usage: check_oracle.py <sfDir> <verifyOutDir> [jsonOut]

With jsonOut, also writes a CORRECTNESS-shaped JSON summary (the standing
sf0.1 sweep artifact, e.g. SWEEP_r04.json).
"""
import sys, json, glob, math
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def canon(df):
    df = df[sorted(df.columns)]
    return df

def values_equal(a, b):
    if a is b:
        return True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    try:  # NaN/NaT of any dtype (numpy datetime64 NaT != itself)
        an, bn = a != a, b != b
        if isinstance(an, (bool,)) or getattr(an, "ndim", 1) == 0:
            if bool(an) and bool(bn):
                return True
    except Exception:
        pass
    return a == b

def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    n_pass = n_fail = 0
    summary = {}
    def record(name, rows_match, schema_match, hash_match, srows, orows, err):
        summary[name] = {"rows_match": rows_match, "schema_match": schema_match,
                         "hash_match": hash_match, "spark_rows": srows,
                         "oracle_rows": orows, "err": err}
    for name in sorted(oracle):
        sql = oracle[name]
        try:
            duck = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            record(name, False, False, False, 0, 0, f"oracle SQL error: {e}")
            n_fail += 1
            continue
        files = glob.glob(f"{outdir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output")
            record(name, False, False, False, 0, 0, "no spark output")
            n_fail += 1
            continue
        spark = con.execute(
            f"SELECT * FROM read_parquet('{outdir}/{name}/*.parquet')").fetchdf()
        duck_c, spark_c = canon(duck), canon(spark)
        if list(duck_c.columns) != list(spark_c.columns):
            print(f"FAIL {name}: columns {list(spark_c.columns)} != oracle {list(duck_c.columns)}")
            record(name, len(duck_c) == len(spark_c), False, False,
                   len(spark_c), len(duck_c), None)
            n_fail += 1
            continue
        if len(duck_c) != len(spark_c):
            print(f"FAIL {name}: rows {len(spark_c)} != oracle {len(duck_c)}")
            record(name, False, True, False, len(spark_c), len(duck_c), None)
            n_fail += 1
            continue
        # dtype comparison (parquet physical types must agree)
        dt_mism = [(c, str(spark_c[c].dtype), str(duck_c[c].dtype))
                   for c in duck_c.columns if str(spark_c[c].dtype) != str(duck_c[c].dtype)]
        bad = None
        sr = spark_c.to_records(index=False)
        dr = duck_c.to_records(index=False)
        for i in range(len(sr)):
            for j, c in enumerate(duck_c.columns):
                if not values_equal(sr[i][j], dr[i][j]):
                    bad = (i, c, sr[i][j], dr[i][j])
                    break
            if bad:
                break
        if bad:
            print(f"FAIL {name}: row {bad[0]} col {bad[1]}: spark={bad[2]!r} oracle={bad[3]!r}")
            record(name, True, True, False, len(spark_c), len(duck_c), None)
            n_fail += 1
        else:
            note = f" (dtype diff: {dt_mism})" if dt_mism else ""
            print(f"PASS {name}: {len(sr)} rows{note}")
            record(name, True, True, True, len(sr), len(dr), None)
            n_pass += 1
    if len(sys.argv) > 3:
        with open(sys.argv[3], "w") as f:
            json.dump(summary, f, indent=2, sort_keys=True)
    print(f"\n{n_pass} passed, {n_fail} failed")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
