#!/bin/bash
# Round-4 owed bench rows (BENCHMARKS.md:400-403): serving with the
# device table, alternated with host mode back-to-back in ONE tunnel
# window, 2 reps each (CLAUDE.md methodology: never compare across
# windows).  Emits one JSON line per run to stdout.
set -u
cd /root/repo
for rep in 0 1; do
  for mode in host table; do
    flag=""
    if [ "$mode" = table ]; then flag="--device_features"; fi
    echo "=== rep=$rep mode=$mode $(date -u +%H:%M:%S) ===" >&2
    timeout 2400 python scripts/bench_serving.py --clients 8 --requests 96 \
      --micro_batch 8 $flag --port 8491 2>>/tmp/owed_serving.err \
      | sed "s/^/{\"rep\": $rep, \"mode\": \"$mode\", \"result\": /; s/$/}/"
  done
done
