#!/usr/bin/env bash
# Round-17 measurement chain (r16 VERDICT #3/#4/#5), run detached via
# `setsid nohup tools/round17_measure.sh &`. Sequential, each Spark/
# DuckDB pair back-to-back from an idle window per BASELINE.md:
#   1. idle sf0.1 pair  -> BENCH_IDLE_r17.json / BASELINE_IDLE_r17.json
#   2. idle sf1 pair    -> BENCH_SF1_IDLE_r17.json / BASELINE_SF1_IDLE_r17.json
#      (DuckDB skips llm_cluster_fixpoint — engine-hostile recursive
#      CTE, recorded in the artifact; quote ex-skip on BOTH sides)
#   3. sf100 streaming LSH row -> STREAMBENCH_SF100_r17.json
# Assumes: repo compiled, /tmp/verify_out/oracle_sql.json fresh
# (unfiltered), /tmp/graftdata/{sf1,sf100} present.
set -uo pipefail
cd /root/repo
log=/tmp/round17_measure.log
exec >>"$log" 2>&1

stamp() { echo "[measure $(date +%H:%M:%S) l=$(cut -d' ' -f1-3 /proc/loadavg)] $*"; }

await_idle() { # wait for 15-min loadavg < 1.0, up to $1 minutes
  local limit=${1:-75} i l15
  for i in $(seq 1 $((limit * 2))); do
    l15=$(cut -d' ' -f3 /proc/loadavg)
    if awk "BEGIN{exit !($l15 < 1.0)}"; then stamp "idle (15m=$l15)"; return 0; fi
    sleep 30
  done
  stamp "idle wait timed out (15m=$l15) — proceeding, artifact self-stamps"
}

run_pair() { # $1 sfDir  $2 benchOut  $3 baselineOut  $4 extra duckdb env
  stamp "pair: $1 -> $2 / $3"
  await_idle
  SPARK_GRAFT_SF_DIR="$1" SPARK_GRAFT_BENCH_OUT="$2" SPARK_DRIVER_MEM=48g \
    sbt -batch "runMain graft.Bench" || { stamp "BENCH FAILED for $1"; return 1; }
  stamp "spark side done; duckdb side starts back-to-back"
  env $4 python3 tools/baseline_duckdb.py "$1" /tmp/verify_out/oracle_sql.json "$3" \
    || { stamp "BASELINE FAILED for $1"; return 1; }
  stamp "pair done: $1"
}

stamp "=== round 17 measurement chain starts ==="

run_pair /root/testdata/sf0.1 \
  /root/repo/BENCH_IDLE_r17.json /root/repo/BASELINE_IDLE_r17.json ""

run_pair /tmp/graftdata/sf1 \
  /root/repo/BENCH_SF1_IDLE_r17.json /root/repo/BASELINE_SF1_IDLE_r17.json \
  "BASELINE_SKIP=llm_cluster_fixpoint"

stamp "streambench sf100 starts (5M docs; width derives from documents subset)"
SPARK_DRIVER_MEM=64g \
  sbt -batch "runMain graft.StreamBench /tmp/graftdata/sf100 /root/repo/STREAMBENCH_SF100_r17.json" \
  || stamp "STREAMBENCH sf100 FAILED"

stamp "=== chain complete ==="
