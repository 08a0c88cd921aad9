#!/usr/bin/env python3
"""Pin a concrete single-node baseline: time every oracle SQL in DuckDB
over the same parquet tables (VERDICT r01 asked for a numeric baseline
to make the 2x BENCH gate enforceable; the reference publishes no
numbers, so DuckDB-on-the-same-queries is the single-node proxy).

Usage: python3 tools/baseline_duckdb.py [sfDir] [oracle_sql.json] [out.json]
Writes {"total_sec": N, "queries": {name: sec}, "sf": dir, "engine": "duckdb"}.
"""
import sys, json, time
import duckdb

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
oracle_path = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out/oracle_sql.json"
out_path = sys.argv[3] if len(sys.argv) > 3 else "BASELINE_LOCAL.json"

con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

oracle = json.load(open(oracle_path))
times, failures = {}, []
for name, sql in sorted(oracle.items()):
    t0 = time.monotonic()
    try:
        con.sql(sql).fetchall()
        times[name] = round(time.monotonic() - t0, 3)
    except Exception as e:
        failures.append(name)
        times[name] = -round(time.monotonic() - t0, 3)
        print(f"FAIL {name}: {e}", file=sys.stderr)

result = {"engine": "duckdb", "sf": sf_dir,
          "total_sec": round(sum(v for v in times.values() if v >= 0), 2),
          "queries": times, "failures": failures}
json.dump(result, open(out_path, "w"), indent=1)
print(json.dumps({k: result[k] for k in ("engine", "sf", "total_sec", "failures")}))
for name, sec in sorted(times.items(), key=lambda kv: -abs(kv[1]))[:10]:
    print(f"{sec:8.2f}  {name}")
