#!/bin/bash
# r13 sf100 oracle rotation, batch 2: the remaining 44 queries —
# closes the sf100 correctness column to 94/94. Cheap-first order so an
# end-of-round kill costs only the tail; each query's dump is deleted
# after a green check to bound peak disk.
set -u
cd /root/repo
LOG=tools/sweeps/r13_sf100_check.log
DUMP=/root/verify_sf100_b2
OPENS="--add-opens=java.base/java.lang=ALL-UNNAMED --add-opens=java.base/java.lang.invoke=ALL-UNNAMED --add-opens=java.base/java.lang.reflect=ALL-UNNAMED --add-opens=java.base/java.io=ALL-UNNAMED --add-opens=java.base/java.net=ALL-UNNAMED --add-opens=java.base/java.nio=ALL-UNNAMED --add-opens=java.base/java.util=ALL-UNNAMED --add-opens=java.base/java.util.concurrent=ALL-UNNAMED --add-opens=java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens=java.base/sun.nio.ch=ALL-UNNAMED --add-opens=java.base/sun.nio.cs=ALL-UNNAMED --add-opens=java.base/sun.security.action=ALL-UNNAMED --add-opens=java.base/sun.util.calendar=ALL-UNNAMED"
QS_CSV=$(cat /tmp/batch2_csv.txt)
echo "# r13 batch-2 dump started $(date)" >> $LOG
SPARK_GRAFT_ONLY="$QS_CSV" SPARK_GRAFT_CPUS=32 SPARK_GRAFT_OUT_PARTS=0 \
  java $OPENS -Xmx64g -cp 'target/scala-2.13/classes:/opt/spark/jars/*' \
  graft.Verify testdata_sf100 $DUMP > /tmp/dump_b2.log 2>&1
echo "# batch-2 dump rc=$? $(date)" >> $LOG
for q in $(echo $QS_CSV | tr ',' ' '); do
  echo "=== $q $(date +%H:%M) ===" >> $LOG
  TMPDIR=/root/duck_tmp CHECK_MODE=hash DUCKDB_MEM=60GB DUCKDB_THREADS=16 \
    timeout 5400 python3 tools/check.py testdata_sf100 $DUMP "^$q\$" >> $LOG 2>&1
  rc=$?
  echo "=== $q exit=$rc $(date +%H:%M) ===" >> $LOG
  [ $rc -eq 0 ] && rm -rf "$DUMP/$q"
done
echo "BATCH2 DONE $(date)" >> /tmp/sweeps_done.txt
