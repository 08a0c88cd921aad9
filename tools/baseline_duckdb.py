#!/usr/bin/env python3
"""Pin a concrete single-node baseline: time every oracle SQL in DuckDB
over the same parquet tables (VERDICT r01 asked for a numeric baseline
to make the 2x BENCH gate enforceable; the reference publishes no
numbers, so DuckDB-on-the-same-queries is the single-node proxy).

Usage: python3 tools/baseline_duckdb.py [sfDir] [oracle_sql.json] [out.json]
Writes {"total_sec": N, "queries": {name: sec}, "sf": dir, "engine": "duckdb"}.

Protocol (r12 ADVICE, tightened r14 per r13 ADVICE medium): the Spark
bench reports per-query `steady` = min of 2 post-warm iterations and
`envelope` = min over ALL post-warm samples (with the default
SPARK_GRAFT_BENCH_PASSES=3 that is 4 samples: 2 pass-1 iterations + 1
per extra pass). The r13 idle pair compared Spark's 4-sample envelope
against a DuckDB min-of-2 — asymmetric sample counts that bias the
quoted gap (ADVICE r13). Each oracle therefore now runs 1 cold +
POSTWARM_RUNS post-warm (default 4, env BASELINE_POSTWARM_RUNS):
`queries`/`total_sec` keep the r12-comparable min-of-2, and
`queries_envelope`/`envelope_total_sec` carry the min over all
post-warm runs — the symmetric comparator for Bench's `envelope`.
"""
import sys, json, os, time
import duckdb

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
oracle_path = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out/oracle_sql.json"
out_path = sys.argv[3] if len(sys.argv) > 3 else "BASELINE_LOCAL.json"
postwarm = max(2, int(os.environ.get("BASELINE_POSTWARM_RUNS", "4")))

con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

oracle = json.load(open(oracle_path))
# BASELINE_SKIP (comma-separated names): for scale pairs where a
# specific oracle is known engine-hostile (llm_cluster_fixpoint's
# shipped recursive-CTE closure is quadratic — 37.7 s at sf0.1,
# projected hours at sf1). Skipped names are recorded in the artifact;
# the quoted composition must then be ex-skip on BOTH sides.
skip = set(filter(None, os.environ.get("BASELINE_SKIP", "").split(",")))
times, envelope, first, failures = {}, {}, {}, []
for name, sql in sorted(oracle.items()):
    if name in skip:
        continue
    runs = []
    for _ in range(1 + postwarm):
        t0 = time.monotonic()
        try:
            con.sql(sql).fetchall()
            runs.append(round(time.monotonic() - t0, 3))
        except Exception as e:
            runs = None
            failures.append(name)
            times[name] = envelope[name] = first[name] = \
                -round(time.monotonic() - t0, 3)
            print(f"FAIL {name}: {e}", file=sys.stderr)
            break
    if runs:
        first[name] = runs[0]
        times[name] = min(runs[1:3])   # min-of-2 post-warm (r12-comparable)
        envelope[name] = min(runs[1:])  # min of ALL post-warm = Bench envelope peer

result = {"engine": "duckdb", "sf": sf_dir,
          "protocol": f"queries=min of 2 post-warm runs (r12-comparable); "
                      f"queries_envelope=min of {postwarm} post-warm runs "
                      "(symmetric with Bench.scala envelope at "
                      "SPARK_GRAFT_BENCH_PASSES=3); queries_first = cold run",
          "total_sec": round(sum(v for v in times.values() if v >= 0), 2),
          "envelope_total_sec": round(
              sum(v for v in envelope.values() if v >= 0), 2),
          "first_total_sec": round(sum(v for v in first.values() if v >= 0), 2),
          "queries": times, "queries_envelope": envelope,
          "queries_first": first, "failures": failures,
          "skipped": sorted(skip)}
json.dump(result, open(out_path, "w"), indent=1)
print(json.dumps({k: result[k] for k in
                  ("engine", "sf", "total_sec", "envelope_total_sec",
                   "first_total_sec", "failures")}))
for name, sec in sorted(times.items(), key=lambda kv: -abs(kv[1]))[:10]:
    print(f"{sec:8.2f}  {name}")
