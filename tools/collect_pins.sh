#!/bin/bash
# Drive the BENCH_PINS.json collection (r13 verdict task #1): one
# fresh JVM per query (run/fork), ambient-steal probe before each so
# obviously-contended windows are skipped cheaply, loop until every
# default query holds a qualifying (<0.1 steal_cpus) pin or MAX_LOOPS
# is exhausted. Safe to re-run: BenchPins merges monotonically.
#
# Usage: tools/collect_pins.sh [query ...]   (defaults: the 12 pins)
set -u
cd "$(dirname "$0")/.."
QUERIES=("$@")
if [ ${#QUERIES[@]} -eq 0 ]; then
  # keep in sync with BenchPins.DefaultQueries (the >~1.8s coverage set)
  QUERIES=(q27_ngram_jaccard q42b_dedup_groups_lsh q53_curate \
    q53b_curate_srcquota q54_triangle_count q55_pagerank \
    q57_communities q64_semdedup q71_substring_dedup \
    q90_source_quota q94_mmr q99_hybrid_rrf \
    q102_rag_search q103_curate_incremental q103b_curate_frozen \
    q10_pickup_pipeline q11_pricing_summary q13_regional_revenue \
    q25_dedup_minhash q26_dedup_simhash q28_knn_bruteforce \
    q29b_knn_lsh_int q39_repetition_stats q42_dedup_groups \
    q43_video_meta q49_decontaminate_fuzzy q63_knn_ivf_exact \
    q65_pq_codes q66_ivfadc q74_ccnet_buckets \
    q80_leakage_split q81_contamination_report \
    q84_memorization_risk q89_copurchase_topk \
    q104_kn_trigram q104b_kn_fivegram q105_url_filter \
    q67b_bpe_bytes_train q68b_bpe_bytes_encode)
fi
MAX_LOOPS=${MAX_LOOPS:-3}
for loop in $(seq 1 "$MAX_LOOPS"); do
  todo=()
  for q in "${QUERIES[@]}"; do
    if ! python3 - "$q" <<'EOF' 2>/dev/null
import json, sys
p = json.load(open("BENCH_PINS.json"))
sys.exit(0 if sys.argv[1] in p.get("queries", {}) else 1)
EOF
    then todo+=("$q"); fi
  done
  if [ ${#todo[@]} -eq 0 ]; then echo "[pins] all queries pinned"; break; fi
  echo "[pins] loop $loop: ${#todo[@]} unpinned: ${todo[*]}"
  for q in "${todo[@]}"; do
    s0=$(awk '/^cpu /{print $9}' /proc/stat); sleep 3
    s1=$(awk '/^cpu /{print $9}' /proc/stat)
    rate=$(( (s1 - s0) / 3 ))
    if [ "$rate" -ge 15 ]; then
      echo "[pins] steal ${rate} j/s — skipping $q this loop"; sleep 30; continue
    fi
    sbt -batch "runMain graft.tools.BenchPins $q" 2>&1 | grep "\[pin\]"
  done
done
python3 -c 'import json; p=json.load(open("BENCH_PINS.json")); print("[pins] final:", {k: v["wall"] for k, v in p["queries"].items()})'
