#!/usr/bin/env python3
"""Pin a concrete single-node baseline: time every oracle SQL in DuckDB
over the same parquet tables (VERDICT r01 asked for a numeric baseline
to make the 2x BENCH gate enforceable; the reference publishes no
numbers, so DuckDB-on-the-same-queries is the single-node proxy).

Usage: python3 tools/baseline_duckdb.py [sfDir] [oracle_sql.json] [out.json]
Writes {"total_sec": N, "queries": {name: sec}, "sf": dir, "engine": "duckdb"}.

Protocol (r12 ADVICE): the Spark bench reports `steady` as the min of
post-warm iterations after an idle wait; a single cold DuckDB run per
query would be an asymmetric comparator that flatters the Spark side.
Each oracle therefore runs 3x here too: run 1 is the cold number
(`queries_first`), `queries`/`total_sec` carry min(run2, run3) — the
same min-of-2-post-warm estimator Bench.scala uses, so steady-vs-
baseline ratios are like-for-like.
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
times, first, failures = {}, {}, []
for name, sql in sorted(oracle.items()):
    runs = []
    for _ in range(3):
        t0 = time.monotonic()
        try:
            con.sql(sql).fetchall()
            runs.append(round(time.monotonic() - t0, 3))
        except Exception as e:
            runs = None
            failures.append(name)
            times[name] = first[name] = -round(time.monotonic() - t0, 3)
            print(f"FAIL {name}: {e}", file=sys.stderr)
            break
    if runs:
        first[name] = runs[0]
        times[name] = min(runs[1:])  # min-of-2 post-warm, like Bench.scala

result = {"engine": "duckdb", "sf": sf_dir,
          "protocol": "steady=min of 2 post-warm runs per query (symmetric "
                      "with Bench.scala r12); queries_first = cold run",
          "total_sec": round(sum(v for v in times.values() if v >= 0), 2),
          "first_total_sec": round(sum(v for v in first.values() if v >= 0), 2),
          "queries": times, "queries_first": first, "failures": failures}
json.dump(result, open(out_path, "w"), indent=1)
print(json.dumps({k: result[k] for k in
                  ("engine", "sf", "total_sec", "first_total_sec", "failures")}))
for name, sec in sorted(times.items(), key=lambda kv: -abs(kv[1]))[:10]:
    print(f"{sec:8.2f}  {name}")
