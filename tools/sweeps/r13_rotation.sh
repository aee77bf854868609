#!/bin/bash
# r13 sf100 oracle rotation: 25 not-yet-checked queries + 4 re-checks of
# the round-13 two-pass-argmax kmeans oracles (q34/q53/q64/q90).
# Protocol (r12 lessons): ONE QUERY PER PROCESS, SERIAL; hash mode;
# DUCKDB_THREADS caps untracked allocations; TMPDIR on the big volume.
set -u
cd /root/repo
LOG=tools/sweeps/r13_sf100_check.log
DUMP=${DUMP_DIR:-/root/verify_sf100_r13}
QS="q05_dedup_latest q12_anti_join q13_semi_join q14_topk q21_knn_cosine \
q28_rollup_agg q31_sql_text q37_simhash_pairs q39_sessionize q42_asof_join \
q55_char_diversity q56_kmeans_step q60_time_pairs q62_seq_packing \
q65_asof_native q67_decontaminate q68_robust_outliers q71_range_join \
q73_heavy_hitters q74_asof_tolerance q83_hll_union q85_retention_cohorts \
q86_subqueries q87_deciles q88_portable_stats \
q34_ivf_assign q53_ivf_search q64_ivfpq_search q90_semdedup"
echo "# r13 rotation started $(date)" >> $LOG
for q in $QS; do
  echo "=== $q $(date +%H:%M) ===" >> $LOG
  TMPDIR=/root/duck_tmp CHECK_MODE=hash \
    DUCKDB_MEM=${DUCKDB_MEM:-60GB} DUCKDB_THREADS=${DUCKDB_THREADS:-16} \
    timeout 5400 python3 tools/check.py testdata_sf100 "$DUMP" "^$q\$" >> $LOG 2>&1
  echo "=== $q exit=$? $(date +%H:%M) ===" >> $LOG
done
echo "ROTATION DONE $(date)" >> /tmp/sweeps_done.txt
