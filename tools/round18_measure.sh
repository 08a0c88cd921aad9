#!/usr/bin/env bash
# Round-18 measurement chain (r17 VERDICT #3/#6/#8), run detached via
# `setsid nohup tools/round18_measure.sh &`. Gate: 15-min loadavg < 0.85
# confirmed twice 150 s apart (the r17b protocol — the <1.0 single-shot
# gate left no headroom and stamped "contended" off stale tails).
#   1. idle sf0.1 pair -> BENCH_IDLE_r18.json / BASELINE_IDLE_r18.json;
#      if the Spark artifact stamps "idle" it is COPIED to BENCH_r18.json
#      (r17 VERDICT #6: the checked-in per-round file must be the idle
#      artifact); one re-gated retry otherwise.
#   2. idle sf1 pair -> BENCH_SF1_IDLE_r18.json / BASELINE_SF1_IDLE_r18
#      (DuckDB skips llm_cluster_fixpoint; quote ex-skip both sides).
#   3. sf1000 LSH decade -> STREAMBENCH_SF1000_r18.json (lsh mode:
#      h900 hdfs + h900 rocksdb + full-horizon rocksdb, pair-set
#      exactness vs the batch replay).
# Assumes: repo compiled, /tmp/verify_out/oracle_sql.json fresh
# (unfiltered), /tmp/graftdata/{sf1,sf1000} present.
set -uo pipefail
cd /root/repo
log=/tmp/round18_measure.log
exec >>"$log" 2>&1

stamp() { echo "[measure $(date +%H:%M:%S) l=$(cut -d' ' -f1-3 /proc/loadavg)] $*"; }

await_idle() { # strict gate: 15-min loadavg < 0.85 confirmed twice 150 s apart
  local ok=0 i l15
  for i in $(seq 1 240); do # up to ~2 h
    l15=$(cut -d' ' -f3 /proc/loadavg)
    if awk "BEGIN{exit !($l15 < 0.85)}"; then
      ok=$((ok + 1))
      if [ "$ok" -ge 2 ]; then stamp "idle confirmed (15m=$l15)"; return 0; fi
      sleep 150
    else
      ok=0
      sleep 30
    fi
  done
  stamp "idle wait timed out (15m=$l15) — proceeding, artifact self-stamps"
}

bench_window() { python3 -c "import json,sys;print(json.load(open(sys.argv[1])).get('window','?'))" "$1" 2>/dev/null; }

run_spark_bench() { # $1 sfDir $2 out
  SPARK_GRAFT_SF_DIR="$1" SPARK_GRAFT_BENCH_OUT="$2" SPARK_DRIVER_MEM=48g \
    sbt -batch "runMain graft.Bench"
}

stamp "=== round 18 measurement chain starts ==="

# ---- 1. sf0.1 pair, idle-stamped, copied to the per-round file ----
await_idle
run_spark_bench /root/testdata/sf0.1 /root/repo/BENCH_IDLE_r18.json \
  || stamp "BENCH sf0.1 FAILED"
w=$(bench_window /root/repo/BENCH_IDLE_r18.json)
stamp "sf0.1 spark window: $w"
if [ "$w" != "idle" ]; then
  stamp "contended — one re-gated retry"
  await_idle
  run_spark_bench /root/testdata/sf0.1 /root/repo/BENCH_IDLE_r18.json \
    || stamp "BENCH sf0.1 retry FAILED"
  w=$(bench_window /root/repo/BENCH_IDLE_r18.json)
  stamp "sf0.1 retry window: $w"
fi
cp /root/repo/BENCH_IDLE_r18.json /root/repo/BENCH_r18.json
stamp "BENCH_r18.json <- idle artifact (window=$w)"
stamp "duckdb sf0.1 back-to-back"
python3 tools/baseline_duckdb.py /root/testdata/sf0.1 \
  /tmp/verify_out/oracle_sql.json /root/repo/BASELINE_IDLE_r18.json \
  || stamp "BASELINE sf0.1 FAILED"

# ---- 2. sf1 pair, idle-stamped (r17 VERDICT #3) ----
await_idle
run_spark_bench /tmp/graftdata/sf1 /root/repo/BENCH_SF1_IDLE_r18.json \
  || stamp "BENCH sf1 FAILED"
stamp "sf1 spark window: $(bench_window /root/repo/BENCH_SF1_IDLE_r18.json)"
stamp "duckdb sf1 back-to-back"
BASELINE_SKIP=llm_cluster_fixpoint python3 tools/baseline_duckdb.py \
  /tmp/graftdata/sf1 /tmp/verify_out/oracle_sql.json \
  /root/repo/BASELINE_SF1_IDLE_r18.json \
  || stamp "BASELINE sf1 FAILED"

# ---- 3. sf1000 LSH decade (r17 VERDICT #8 stretch) ----
# The 50 M-doc corpus is ~100 GB+ generated parquet; skip cleanly when
# the sandbox doesn't hold it (r18: free disk < corpus, documented in
# OPTIMIZATION_r18.md "Not yet optimized").
if [ ! -d /tmp/graftdata/sf1000 ]; then
  stamp "sf1000 corpus absent - skipping the stretch decade"
  stamp "=== chain complete (sf1000 skipped) ==="
  exit 0
fi
stamp "streambench sf1000 lsh mode starts (50M docs)"
SPARK_DRIVER_MEM=64g sbt -batch \
  "runMain graft.StreamBench /tmp/graftdata/sf1000 /root/repo/STREAMBENCH_SF1000_r18.json lsh" \
  || stamp "STREAMBENCH sf1000 FAILED"

stamp "=== chain complete ==="
