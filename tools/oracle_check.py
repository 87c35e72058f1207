#!/usr/bin/env python3
"""Local mirror of the driver's DuckDB oracle compare: for each query in
outDir/oracle_sql.json, run the SQL in DuckDB over the sf parquet tables and
compare to the Spark-dumped parquet (columns sorted by name, rows sorted by
all columns)."""
import duckdb, json, sys, math

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")

oracle = json.load(open(f"{out}/oracle_sql.json"))
fails = []
for name, sql in sorted(oracle.items()):
    try:
        exp = con.execute(sql).fetchdf()
    except Exception as e:
        print(f"FAIL {name}: oracle SQL error: {str(e)[:300]}")
        fails.append(name)
        continue
    try:
        got = duckdb.query(f"SELECT * FROM '{out}/{name}/*.parquet'").fetchdf()
    except Exception as e:
        print(f"FAIL {name}: spark output unreadable: {str(e)[:200]}")
        fails.append(name)
        continue
    exp = exp.reindex(sorted(exp.columns), axis=1)
    got = got.reindex(sorted(got.columns), axis=1)
    if list(exp.columns) != list(got.columns):
        print(f"FAIL {name}: columns {list(got.columns)} != {list(exp.columns)}")
        fails.append(name)
        continue
    if len(exp) != len(got):
        print(f"FAIL {name}: rows {len(got)} != {len(exp)}")
        fails.append(name)
        continue
    exp = exp.sort_values(by=list(exp.columns)).reset_index(drop=True)
    got = got.sort_values(by=list(got.columns)).reset_index(drop=True)
    bad = None
    for c in exp.columns:
        e, g = exp[c], got[c]
        # dtype-strict like the driver's hash: DuckDB HUGEINT (int128) comes
        # back as object/float while Spark BIGINT is int64 — a value-equal
        # but type-different column is a driver hash_match failure
        if e.dtype.kind != g.dtype.kind:
            bad = f"col {c}: dtype {g.dtype} != oracle dtype {e.dtype}"
            break
        if e.dtype.kind == "f" or g.dtype.kind == "f":
            ok = all(
                (math.isnan(x) and math.isnan(y)) or abs(x - y) <= 1e-9 * max(1, abs(x))
                for x, y in zip(e.astype(float), g.astype(float)))
        else:
            ok = all(str(x) == str(y) for x, y in zip(e, g))
        if not ok:
            mism = [(i, x, y) for i, (x, y) in enumerate(zip(e, g)) if str(x) != str(y)][:3]
            bad = f"col {c}: {mism}"
            break
    if bad:
        print(f"FAIL {name}: {bad}")
        fails.append(name)
    else:
        print(f"PASS {name} ({len(exp)} rows)")

print(f"\n{len(oracle) - len(fails)}/{len(oracle)} PASS")
sys.exit(1 if fails else 0)
