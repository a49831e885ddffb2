#!/bin/bash
# FINAL constants + driver-shape runs with the rbg AWGN default.
cd /root/repo
OUT=bench_out
set -x
for c in loopback64 lte1024 lte2048; do
  timeout 3000 python bench_roofline.py $c --batch 16 --update-constants \
    > $OUT/r5g_roof_${c}.log 2>&1
done
timeout 4000 python bench.py > $OUT/r5g_bench_driver_default.log 2>&1
timeout 4000 python bench.py 32 lte1024 32 > $OUT/r5g_bench_lte1024.log 2>&1
timeout 4000 python bench.py 32 lte2048 16 > $OUT/r5g_bench_lte2048.log 2>&1
echo DONE
