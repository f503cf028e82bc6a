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
# r13: lane widened (VERDICT r12 #3) to the previously untested heavy
# families — multimodal codecs, events streaming twins, ledger
# maintenance (incl. the commit-volume query, whose COMMIT COUNT
# scales with the data) — on top of the r12 dedup/ANN/text/corpus set.
Q=${1:-dedup_clusters,dedup_minhash_pairs,dedup_simhash_pairs,dedup_duplicate_spans,dedup_lsh_planner,ann_cosine_topk,ann_ivf_topk,ann_graph_recall,ann_knn_graph,cluster_top_terms,text_top_repeats,text_bpe_encode,text_tokenizer_compare,text_quality_gate,corpus_coverage_selection,corpus_funnel_v2,dsv2_compaction,dsv2_cdc_incremental_dedup,dsv2_sorted_compaction,events_sessionized,multimodal_pixel_stats,multimodal_wav_stats,multimodal_video_stats,multimodal_ahash_pairs,multimodal_thumbnail,multimodal_media_summary,multimodal_jpeg_stats,multimodal_hist_similarity,events_session_window,events_windowed_agg,events_watermark_lateness,events_sliding_window,events_funnel,events_top_paths,events_salted_join,events_user_deciles,dsv2_commit_volume,dsv2_mor_update,dsv2_merge_mor,dsv2_restore_expire,dsv2_wap_publish,dsv2_cdf_stream_replication,dsv2_stream_equality_upsert,dsv2_equality_upsert}

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
# wall + the r13 resource columns (shuffle volume and max per-task
# peak execution memory — the scale-out costs wall can hide)
hdr = (f"{'query':34s} {'s_s':>7s} {'b_s':>7s} {'rat':>5s}"
       f" {'shW_s':>8s} {'shW_b':>9s} {'shrat':>6s}"
       f" {'pkM_s':>7s} {'pkM_b':>7s} {'spill_b':>8s}")
print(hdr)
tot_s = tot_b = 0.0
for q in sorted(s['queries']):
    xs, xb = s['queries'][q], b['queries'][q]
    rs = s.get('resources', {}).get(q, {})
    rb = b.get('resources', {}).get(q, {})
    tot_s += xs; tot_b += xb
    shs, shb = rs.get('sh_w_mb', 0), rb.get('sh_w_mb', 0)
    shrat = (shb / shs) if shs else float('nan')
    print(f"{q:34s} {xs:7.2f} {xb:7.2f} {xb/xs:5.2f}"
          f" {shs:8.1f} {shb:9.1f} {shrat:6.2f}"
          f" {rs.get('peak_task_mem_mb',0):7.1f}"
          f" {rb.get('peak_task_mem_mb',0):7.1f}"
          f" {rb.get('spill_mb',0):8.1f}")
print(f"{'TOTAL (cold)':34s} {tot_s:7.2f} {tot_b:7.2f} {tot_b/tot_s:5.2f}")
errs = {q: v for q, v in b['status'].items() if v != 'ok'}
if errs: print("ERRORS at sf1.0:", errs)
EOF
