#!/bin/bash
# sf1.0 scale-proof lane: build a 10x replica of sf0.1 (graft.ScaleLane),
# time the heavy operator families at BOTH scales through the normal
# bench path, and print per-query sf0.1 -> sf1.0 wall ratios.
# Record the table in GATES.md; anything super-linear (ratio >> 10 with
# no documented constructive reason) is a plan bug.
# Usage: tools/scale_lane.sh [queries-csv]
set -e
SRC=${SPARK_GRAFT_SRC:-/root/testdata/sf0.1}
BIG=${SPARK_GRAFT_BIG:-/tmp/graft_sf1.0}
Q=${1:-dedup_clusters,dedup_minhash_pairs,dedup_simhash_pairs,dedup_duplicate_spans,dedup_lsh_planner,ann_cosine_topk,ann_ivf_topk,ann_graph_recall,ann_knn_graph,cluster_top_terms,text_top_repeats,text_bpe_encode,text_tokenizer_compare,text_quality_gate,corpus_coverage_selection,corpus_funnel_v2,dsv2_compaction,dsv2_cdc_incremental_dedup,dsv2_sorted_compaction,events_sessionized}

MAIN_CLASS=graft.ScaleLane tools/run_verify.sh "$SRC" "$BIG" 2>/dev/null | tail -1

run() {
  SPARK_GRAFT_ONLY="$Q" SPARK_GRAFT_SF_DIR="$1" SPARK_GRAFT_CPUS=32 \
    SPARK_GRAFT_RERUN=0 MAIN_CLASS=graft.Bench tools/run_verify.sh 2>/dev/null | tail -1
  cp BENCH_FULL.json "$2"
}
run "$SRC" /tmp/bench_small.json > /dev/null
run "$BIG" /tmp/bench_big.json > /dev/null

python3 - <<'EOF'
import json
s = json.load(open('/tmp/bench_small.json'))
b = json.load(open('/tmp/bench_big.json'))
print(f"{'query':40s} {'sf0.1_s':>8s} {'sf1.0_s':>8s} {'ratio':>6s}")
tot_s = tot_b = 0.0
for q in sorted(s['queries']):
    xs, xb = s['queries'][q], b['queries'][q]
    tot_s += xs; tot_b += xb
    print(f"{q:40s} {xs:8.2f} {xb:8.2f} {xb/xs:6.2f}")
print(f"{'TOTAL (cold)':40s} {tot_s:8.2f} {tot_b:8.2f} {tot_b/tot_s:6.2f}")
errs = {q: v for q, v in b['status'].items() if v != 'ok'}
if errs: print("ERRORS at sf1.0:", errs)
EOF
