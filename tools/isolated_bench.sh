#!/bin/bash
# Isolated per-query bench lane: re-times each given query ALONE at the
# given SF. Fleet-context numbers (the full-corpus bench) inflate
# 1.5-2.5x under memory/CPU contention — before optimizing a flagged
# query, or when recording round evidence for the top steady rows, use
# this lane and record BOTH numbers in GATES.md.
# Usage: tools/isolated_bench.sh <sfDir> <query> [query...]
set -e
SF=${1:?usage: isolated_bench.sh <sfDir> <query> [query...]}
shift
printf '%-40s %10s %10s\n' query steady_s cold_s
for q in "$@"; do
  line=$(SPARK_GRAFT_ONLY="$q" SPARK_GRAFT_SF_DIR="$SF" SPARK_GRAFT_CPUS=32 \
    MAIN_CLASS=graft.Bench tools/run_verify.sh 2>/dev/null | tail -1)
  echo "$line" | python3 -c "
import json, sys
d = json.load(sys.stdin)
cold = d.get('cold_total', 0) - d.get('prep', 0)
print('%-40s %10.2f %10.2f' % ('$q', d['value'], cold))"
done
