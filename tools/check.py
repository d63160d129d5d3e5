#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: for each Spark result
parquet under OUTDIR, run the matching oracle SQL from oracle_sql.json in
DuckDB over the sf tables, sort columns by name, and compare values.

Usage: python3 tools/check.py /tmp/verify_out /root/testdata/sf0.01
"""
import json, sys, math, os
import duckdb

outdir, sfdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
fails = 0
for name in sorted(os.listdir(outdir)):
    path = os.path.join(outdir, name)
    if not os.path.isdir(path):
        continue
    spark = con.execute(f"SELECT * FROM '{path}/*.parquet'").fetchdf()
    if name not in oracle:
        print(f"{name:24s} rows-only ({len(spark)} rows)")
        continue
    try:
        duck = con.execute(oracle[name]).fetchdf()
    except Exception as e:
        print(f"{name:24s} ORACLE SQL ERROR: {e}")
        fails += 1
        continue
    spark = spark.reindex(sorted(spark.columns), axis=1)
    duck = duck.reindex(sorted(duck.columns), axis=1)
    ok = True
    msgs = []
    if list(spark.columns) != list(duck.columns):
        ok = False
        msgs.append(f"schema {list(spark.columns)} vs {list(duck.columns)}")
    elif len(spark) != len(duck):
        ok = False
        msgs.append(f"rows {len(spark)} vs {len(duck)}")
    else:
        # The driver's compare HASHES values, so dtype matters even when
        # values are ==-equal: a DuckDB HUGEINT (uncast sum) widens to
        # float64 in pandas and hash-mismatches Spark's int64 (r9/r10
        # x94/x96). Flag int-vs-float dtype skew as a failure.
        for c in spark.columns:
            sk, dk = spark[c].dtype.kind, duck[c].dtype.kind
            if {sk, dk} == {"i", "f"}:
                ok = False
                msgs.append(
                    f"col {c} dtype {spark[c].dtype} vs {duck[c].dtype} "
                    "(uncast HUGEINT aggregate? add CAST(... AS BIGINT))")
                break
        for c in (spark.columns if ok else []):
            a, b = spark[c].tolist(), duck[c].tolist()
            for i, (x, y) in enumerate(zip(a, b)):
                if hasattr(x, "tolist"): x = x.tolist()
                if hasattr(y, "tolist"): y = y.tolist()
                same = (x == y) or (x is None and y is None)
                try:
                    if isinstance(x, float) and isinstance(y, float):
                        same = (x == y) or (math.isnan(x) and math.isnan(y))
                except Exception:
                    pass
                if not same and str(x) != str(y):
                    ok = False
                    msgs.append(f"col {c} row {i}: {x!r} != {y!r}")
                    break
            if not ok:
                break
    status = "OK" if ok else "MISMATCH " + "; ".join(msgs)
    if not ok:
        fails += 1
    print(f"{name:24s} {status}  ({len(spark)} rows)")
print("FAILURES:", fails)
sys.exit(1 if fails else 0)
