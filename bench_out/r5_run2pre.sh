#!/bin/bash
cd /root/repo
OUT=bench_out
set -x
for st in txifft txpallas txfourstep txgrid; do
  timeout 3000 python bench_stages_synced.py $st lte1024 64 \
    > $OUT/r5_stage_${st}_lte1024.log 2>&1
done
bash bench_out/r5_run2.sh
