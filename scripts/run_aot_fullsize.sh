#!/bin/bash
# Round-4 full-size AOT standup rows on the v5e, fresh process per phase,
# cold persistent cache (a never-seen serving box). Plain + device-table.
set -u
cd /root/repo
for mode in plain table; do
  flag=""; dir=/tmp/aot_fs_$mode
  if [ "$mode" = table ]; then flag="--device_features"; fi
  rm -rf "$dir"
  echo "=== $mode export $(date -u +%H:%M:%S) ===" >&2
  timeout 1200 python scripts/bench_aot.py --micro_batch 8 $flag \
    --export_only --keep_dir "$dir" --cold_cache 2>>/tmp/aot_fs.err \
    | sed "s/^/{\"mode\": \"$mode\", \"phase\": \"export\", \"result\": /; s/$/}/"
  echo "=== $mode reload $(date -u +%H:%M:%S) ===" >&2
  timeout 1200 python scripts/bench_aot.py --micro_batch 8 $flag \
    --reload_only --keep_dir "$dir" --cold_cache 2>>/tmp/aot_fs.err \
    | sed "s/^/{\"mode\": \"$mode\", \"phase\": \"reload\", \"result\": /; s/$/}/"
  rm -rf "$dir"
done
