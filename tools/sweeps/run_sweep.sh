#!/bin/bash
# sf100 bench sweep runner — r13 I/O-regime attribution experiments.
# usage: run_sweep.sh <tag> <xmx> [extra-env...]
set -u
cd /root/repo
TAG=$1; XMX=$2; shift 2
OPENS="--add-opens=java.base/java.lang=ALL-UNNAMED --add-opens=java.base/java.lang.invoke=ALL-UNNAMED --add-opens=java.base/java.lang.reflect=ALL-UNNAMED --add-opens=java.base/java.io=ALL-UNNAMED --add-opens=java.base/java.net=ALL-UNNAMED --add-opens=java.base/java.nio=ALL-UNNAMED --add-opens=java.base/java.util=ALL-UNNAMED --add-opens=java.base/java.util.concurrent=ALL-UNNAMED --add-opens=java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens=java.base/sun.nio.ch=ALL-UNNAMED --add-opens=java.base/sun.nio.cs=ALL-UNNAMED --add-opens=java.base/sun.security.action=ALL-UNNAMED --add-opens=java.base/sun.util.calendar=ALL-UNNAMED"
env "$@" \
  SPARK_GRAFT_SF_DIR=${SWEEP_SF_DIR:-testdata_sf100} SPARK_GRAFT_CPUS=32 \
  SPARK_GRAFT_BENCH_TIMEOUT=1200 SPARK_GRAFT_BENCH_BUDGET=7000 \
  SPARK_GRAFT_BENCH_ROUNDS=2 \
  SPARK_GRAFT_ONLY=q04,q11,q13,q20,q49,q53,q61,q64,q66,q72,q73,q79,q80,q90 \
  SPARK_GRAFT_STATS_JSON=/root/repo/tools/sweeps/r13_${TAG}_stats.json \
  SPARK_GRAFT_REPO_DIR=/tmp \
  java $OPENS -Xmx$XMX -cp 'target/scala-2.13/classes:/opt/spark/jars/*' graft.Bench \
  > /tmp/sweep_$TAG.log 2>&1
RC=$?
cp bench_full.json tools/sweeps/r13_${TAG}_bench.json
echo "SWEEP $TAG DONE rc=$RC" >> /tmp/sweeps_done.txt
