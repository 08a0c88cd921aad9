#!/usr/bin/env bash
# End-of-round sf0.1 pair re-run with a STRICTER idle gate (r16 VERDICT
# #5): waits for 15-min loadavg < 0.85 confirmed twice 150 s apart (the
# first chain's <1.0 gate left no headroom for the sbt launch, so both
# Spark runs stamped "contended" off a stale 15-min tail). Artifacts:
# BENCH_IDLE_r17b.json / BASELINE_IDLE_r17b.json (r15b naming).
set -uo pipefail
cd /root/repo
exec >>/tmp/round17_idle_rerun.log 2>&1
stamp() { echo "[rerun $(date +%H:%M:%S) l=$(cut -d' ' -f1-3 /proc/loadavg)] $*"; }

ok=0
for i in $(seq 1 200); do  # up to ~100 min
  l15=$(cut -d' ' -f3 /proc/loadavg)
  if awk "BEGIN{exit !($l15 < 0.85)}"; then
    ok=$((ok + 1))
    if [ "$ok" -ge 2 ]; then stamp "idle confirmed (15m=$l15)"; break; fi
    sleep 150
  else
    ok=0
    sleep 30
  fi
done

SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
SPARK_GRAFT_BENCH_OUT=/root/repo/BENCH_IDLE_r17b.json \
  sbt -batch "runMain graft.Bench" || { stamp "BENCH FAILED"; exit 1; }
stamp "spark side done; duckdb back-to-back"
python3 tools/baseline_duckdb.py /root/testdata/sf0.1 \
  /tmp/verify_out/oracle_sql.json /root/repo/BASELINE_IDLE_r17b.json \
  || { stamp "BASELINE FAILED"; exit 1; }
stamp "pair done"
