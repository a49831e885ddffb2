#!/bin/bash
cd /root/repo
OUT=bench_out
set -x
timeout 4000 python bench_streaming_verified.py lte1024 65280 2 32 \
  > $OUT/r5e_vstream_lte1024_b32.log 2>&1
timeout 4000 python bench_streaming_verified.py lte1024 65280 1 64 \
  > $OUT/r5e_vstream_lte1024_b64.log 2>&1
BENCH_HANKEL_STRIDE=64 timeout 4000 python bench_streaming_verified.py \
  loopback64 65520 2 32 > $OUT/r5e_vstream_loopback64_b32.log 2>&1
BENCH_GEN_BATCH=64 timeout 14000 python bench_generations.py driver \
  > $OUT/r5_generations_b64.log 2>&1
timeout 14000 python bench_stages_synced.py driver lte1024 64 \
  > $OUT/r5e_stages_lte1024.log 2>&1
echo DONE
