#!/bin/bash
cd /root/repo
OUT=bench_out
set -x
timeout 4000 python bench_streaming_verified.py loopback64 65520 4 16 \
  > $OUT/r5d_vstream_loopback64_b16.log 2>&1
timeout 4000 python bench_streaming_verified.py lte1024 65280 4 16 \
  > $OUT/r5d_vstream_lte1024_b16.log 2>&1
timeout 4000 python bench.py > $OUT/r5d_bench_driver_confirm.log 2>&1
echo DONE
