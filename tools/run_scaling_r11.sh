#!/bin/bash
# Round-11 quiet-box scaling measurements (VERDICT r10 items 1+2):
# run with NOTHING else on the box. Three sequential harness runs:
#   1. 10x documents sweep (the full r10 20-query list) — regenerates
#      SCALING.md's first table with absolutes comparable to BENCH_r11
#   2. 100x corpus-proportional family — the new deep-scale rows
#   3. 10x events-side sweep — regenerates the second table
set -e
cd /root/repo
LOG=${1:-/tmp/scaling_r11.log}
: > "$LOG"

echo "=== 10x documents sweep ===" >> "$LOG"
SCALEBENCH_QUERIES="q_pagerank,q_dedup_canonical,q_dedup_clusters,q_minhash_pairs,q_kn5_logprob,q_ccnet_bands,q_bpe_pairs,q_bpe_encode,q_bpe_roundtrip,q_containment,q_exact_substr,q_train_examples,q_decontaminate_neardup,q_skipgram_pairs,q_phrase_search,q_cdc_chunks,q_lid_rank,q_wordpiece,q_triangles,q_gram_novelty" \
  sbt -batch "Test/runMain graft.tools.ScaleBench 10 2" 2>/dev/null \
  | grep -E "^\|" >> "$LOG"

echo "=== 100x corpus-proportional family ===" >> "$LOG"
SCALEBENCH_QUERIES="q_bpe_encode,q_bpe_roundtrip,q_train_examples,q_cdc_chunks" \
  sbt -batch "Test/runMain graft.tools.ScaleBench 100 2" 2>/dev/null \
  | grep -E "^\|" >> "$LOG"

echo "=== 10x events sweep ===" >> "$LOG"
sbt -batch "Test/runMain graft.tools.EventsScaleBench 10 2" 2>/dev/null \
  | grep -E "^\|" >> "$LOG"

echo "=== done ===" >> "$LOG"
