#!/usr/bin/env bash
# Round-19 measurement chain (r18 VERDICT #1), run detached via
# `setsid nohup tools/round19_measure.sh &`. Gate: 15-min loadavg < 0.85
# confirmed twice 150 s apart (the r17b protocol).
#
# r18's sf1 pair self-contaminated (started idle, ended at loadavg 6.5
# against foreign load) and the DuckDB sf1 side never landed. Fixes:
#   - the chain runs the sf1 pair FIRST (the round's headline numbers
#     get the cleanest window), then the sf0.1 pair;
#   - after every bench, the chain SLEEPS 90 s and re-reads loadavg +
#     the top CPU consumers: our own local[32] load decays within a
#     minute, so a still-high 1-min average or a busy foreign process
#     is FOREIGN contention — both are stamped into the sidecar log
#     next to the artifact (the Spark artifact itself also stamps
#     loadavg_start/loadavg_end, but its _end cannot distinguish its
#     own tail load from a neighbor's; the decayed reading can);
#   - the DuckDB side of each pair runs back-to-back behind the same
#     re-gate, so BASELINE_SF1_IDLE_r19.json actually lands (the file
#     OPTIMIZATION_r18.md promised and never produced).
# Assumes: repo compiled, /tmp/verify_out/oracle_sql.json fresh
# (unfiltered), /tmp/graftdata/sf1 present.
set -uo pipefail
cd /root/repo
log=/tmp/round19_measure.log
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

post_window() { # decayed post-run reading: foreign load shows, ours decays
  sleep 90
  stamp "post-window (90 s decay): loadavg=$(cut -d' ' -f1-3 /proc/loadavg)"
  stamp "top cpu: $(ps -eo pcpu,comm --sort=-pcpu | sed -n 2,4p | tr '\n' ';')"
}

bench_window() { python3 -c "import json,sys;print(json.load(open(sys.argv[1])).get('window','?'))" "$1" 2>/dev/null; }

run_spark_bench() { # $1 sfDir $2 out
  SPARK_GRAFT_SF_DIR="$1" SPARK_GRAFT_BENCH_OUT="$2" SPARK_DRIVER_MEM=48g \
    sbt -batch "runMain graft.Bench"
}

stamp "=== round 19 measurement chain starts ==="

# ---- 1. sf1 pair, idle-stamped (r18 VERDICT #1) ----
await_idle
run_spark_bench /tmp/graftdata/sf1 /root/repo/BENCH_SF1_IDLE_r19.json \
  || stamp "BENCH sf1 FAILED"
stamp "sf1 spark window: $(bench_window /root/repo/BENCH_SF1_IDLE_r19.json)"
post_window
await_idle
stamp "duckdb sf1"
BASELINE_SKIP=llm_cluster_fixpoint python3 tools/baseline_duckdb.py \
  /tmp/graftdata/sf1 /tmp/verify_out/oracle_sql.json \
  /root/repo/BASELINE_SF1_IDLE_r19.json \
  || stamp "BASELINE sf1 FAILED"
post_window

# ---- 2. sf0.1 pair, idle-stamped, copied to the per-round file ----
await_idle
run_spark_bench /root/testdata/sf0.1 /root/repo/BENCH_IDLE_r19.json \
  || stamp "BENCH sf0.1 FAILED"
w=$(bench_window /root/repo/BENCH_IDLE_r19.json)
stamp "sf0.1 spark window: $w"
if [ "$w" != "idle" ]; then
  stamp "contended — one re-gated retry"
  await_idle
  run_spark_bench /root/testdata/sf0.1 /root/repo/BENCH_IDLE_r19.json \
    || stamp "BENCH sf0.1 retry FAILED"
  w=$(bench_window /root/repo/BENCH_IDLE_r19.json)
  stamp "sf0.1 retry window: $w"
fi
post_window
await_idle
stamp "duckdb sf0.1 back-to-back"
python3 tools/baseline_duckdb.py /root/testdata/sf0.1 \
  /tmp/verify_out/oracle_sql.json /root/repo/BASELINE_IDLE_r19.json \
  || stamp "BASELINE sf0.1 FAILED"
post_window

stamp "=== chain complete ==="
