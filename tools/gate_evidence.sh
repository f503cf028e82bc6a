#!/bin/bash
# Append this round's self-run gate evidence to GATES.md (VERDICT r8 #7:
# an empty driver artifact must not erase the round's signal — the repo
# carries its own t2-replica + bench witness per round).
#
# Usage: tools/gate_evidence.sh <round> <verifyOut> <checkLog> [benchJson]
set -e
ROUND=${1:?round}
OUT=${2:?verifyOut}
CHECK=${3:?checkLog}
BENCH=${4:-}
cd /root/repo
{
  echo "## Round $ROUND — $(date -u +%Y-%m-%dT%H:%M:%SZ)"
  echo
  echo "- t2 replica (sf0.01): $(tail -1 "$CHECK")"
  echo "- oracle_sql.json sha256: $(sha256sum "$OUT/oracle_sql.json" | cut -d' ' -f1)"
  echo "- git head: $(git rev-parse --short HEAD)"
  if [ -n "$BENCH" ] && [ -f "$BENCH" ]; then
    echo "- bench (sf0.1 local[32]): $(cat "$BENCH" | python3 -c "import json,sys; d=json.load(sys.stdin); print('%ss steady over %d queries, cold_total %ss, errors %s' % (d['value'], len(d['queries']), d.get('cold_total','-'), d.get('errors','-')))")"
  fi
  echo
} >> GATES.md
tail -8 GATES.md
