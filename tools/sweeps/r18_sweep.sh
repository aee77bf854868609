#!/bin/bash
# r18 bench sweeps — q41 two-phase-cumulative re-pin + sf10/sf100
# min-of-2 under the r18 build; bucketed-star interleaved re-measure and
# the sf10-scale SCD2 bucketed merge as side measurements.
# usage: r18_sweep.sh <tag> <sfdir> [only-list]
set -u
cd /root/repo
TAG=$1; SFDIR=$2; ONLY=${3:-}
OPENS="--add-opens=java.base/java.lang=ALL-UNNAMED --add-opens=java.base/java.lang.invoke=ALL-UNNAMED --add-opens=java.base/java.lang.reflect=ALL-UNNAMED --add-opens=java.base/java.io=ALL-UNNAMED --add-opens=java.base/java.net=ALL-UNNAMED --add-opens=java.base/java.nio=ALL-UNNAMED --add-opens=java.base/java.util=ALL-UNNAMED --add-opens=java.base/java.util.concurrent=ALL-UNNAMED --add-opens=java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens=java.base/sun.nio.ch=ALL-UNNAMED --add-opens=java.base/sun.nio.cs=ALL-UNNAMED --add-opens=java.base/sun.security.action=ALL-UNNAMED --add-opens=java.base/sun.util.calendar=ALL-UNNAMED"
ENVV=(SPARK_GRAFT_SF_DIR=$SFDIR SPARK_GRAFT_CPUS=32
  SPARK_GRAFT_BENCH_TIMEOUT=1200 SPARK_GRAFT_BENCH_BUDGET=8000
  SPARK_GRAFT_BENCH_ROUNDS=2
  SPARK_GRAFT_STATS_JSON=/root/repo/tools/sweeps/r18_${TAG}_stats.json
  SPARK_GRAFT_REPO_DIR=/tmp)
[ -n "$ONLY" ] && ENVV+=(SPARK_GRAFT_ONLY=$ONLY)
env "${ENVV[@]}" \
  java $OPENS -Xmx64g -cp 'target/scala-2.13/classes:/opt/spark/jars/*' graft.Bench \
  > /tmp/sweep_r18_$TAG.log 2>&1
RC=$?
cp bench_full.json tools/sweeps/r18_${TAG}_bench.json
echo "SWEEP r18_$TAG DONE rc=$RC $(date)" >> /tmp/sweeps_done.txt
