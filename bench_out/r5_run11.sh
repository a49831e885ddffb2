#!/bin/bash
cd /root/repo
OUT=bench_out
set -x
for c in loopback64 lte1024 lte2048; do
  timeout 3000 python bench_roofline.py $c --batch 16 --update-constants \
    > $OUT/r5h_roof_${c}.log 2>&1
done
timeout 4000 python bench.py 64 lte1024 64 > $OUT/r5h_bench_lte1024_b64.log 2>&1
timeout 4000 python bench.py 32 lte1024 128 > $OUT/r5h_bench_lte1024_b32.log 2>&1
timeout 4000 python bench.py 64 lte2048 32 > $OUT/r5h_bench_lte2048_b64.log 2>&1
timeout 4000 python bench.py 32 lte2048 64 > $OUT/r5h_bench_lte2048_b32.log 2>&1
timeout 4000 python bench.py > $OUT/r5h_bench_driver.log 2>&1
echo DONE
