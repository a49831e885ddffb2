#!/bin/bash
cd /root/repo
OUT=bench_out
set -x
for c in loopback64 lte1024 lte2048; do
  timeout 3000 python bench_roofline.py $c --batch 16 --update-constants \
    > $OUT/r5f_roof_${c}.log 2>&1
  BENCH_PRNG=rbg timeout 3000 python bench_roofline.py $c --batch 16 \
    --update-constants > $OUT/r5f_roof_${c}_rbg.log 2>&1
done
BENCH_PRNG=rbg timeout 4000 python bench.py > $OUT/r5f_bench_driver_rbg.log 2>&1
BENCH_PRNG=rbg timeout 4000 python bench.py 32 lte1024 32 \
  > $OUT/r5f_bench_lte1024_rbg.log 2>&1
BENCH_PRNG=rbg timeout 4000 python bench.py 32 lte2048 16 \
  > $OUT/r5f_bench_lte2048_rbg.log 2>&1
timeout 4000 python bench.py > $OUT/r5f_bench_driver_threefry.log 2>&1
echo DONE
