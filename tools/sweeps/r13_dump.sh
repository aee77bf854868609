#!/bin/bash
# Engine-side sf100 verify dump for the r13 rotation subset.
set -u
cd /root/repo
OPENS="--add-opens=java.base/java.lang=ALL-UNNAMED --add-opens=java.base/java.lang.invoke=ALL-UNNAMED --add-opens=java.base/java.lang.reflect=ALL-UNNAMED --add-opens=java.base/java.io=ALL-UNNAMED --add-opens=java.base/java.net=ALL-UNNAMED --add-opens=java.base/java.nio=ALL-UNNAMED --add-opens=java.base/java.util=ALL-UNNAMED --add-opens=java.base/java.util.concurrent=ALL-UNNAMED --add-opens=java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens=java.base/sun.nio.ch=ALL-UNNAMED --add-opens=java.base/sun.nio.cs=ALL-UNNAMED --add-opens=java.base/sun.security.action=ALL-UNNAMED --add-opens=java.base/sun.util.calendar=ALL-UNNAMED"
SPARK_GRAFT_ONLY="q05_dedup_latest,q12_anti_join,q13_semi_join,q14_topk,q21_knn_cosine,q28_rollup_agg,q31_sql_text,q37_simhash_pairs,q39_sessionize,q42_asof_join,q55_char_diversity,q56_kmeans_step,q60_time_pairs,q62_seq_packing,q65_asof_native,q67_decontaminate,q68_robust_outliers,q71_range_join,q73_heavy_hitters,q74_asof_tolerance,q83_hll_union,q85_retention_cohorts,q86_subqueries,q87_deciles,q88_portable_stats,q34_ivf_assign,q53_ivf_search,q64_ivfpq_search,q90_semdedup" \
  SPARK_GRAFT_CPUS=32 SPARK_GRAFT_OUT_PARTS=0 \
  java $OPENS -Xmx64g -cp 'target/scala-2.13/classes:/opt/spark/jars/*' \
  graft.Verify testdata_sf100 /root/verify_sf100_r13 > /tmp/dump_r13.log 2>&1
echo "DUMP DONE rc=$? $(date)" >> /tmp/sweeps_done.txt
