#!/bin/bash
# round-5 TPU run 5 (FINAL): constants for the settled defaults
# (chan_path=auto), final chain numbers, remaining probes.  After this run
# bench_constants.json must stay consistent with the committed sources.
cd /root/repo
OUT=bench_out
set -x
for c in loopback64 lte1024 lte2048; do
  timeout 3000 python bench_roofline.py $c --batch 16 --update-constants \
    > $OUT/r5d_roof_${c}.log 2>&1
done
BENCH_HANKEL_STRIDE=256 timeout 3000 python bench_roofline.py loopback64 \
  --batch 16 --update-constants > $OUT/r5d_roof_lb64_s256.log 2>&1
timeout 4000 python bench.py > $OUT/r5d_bench_driver_default.log 2>&1
timeout 4000 python bench.py 32 lte1024 32 > $OUT/r5d_bench_lte1024.log 2>&1
timeout 4000 python bench.py 32 lte2048 16 > $OUT/r5d_bench_lte2048.log 2>&1
timeout 4000 python bench.py 128 loopback64 32 \
  > $OUT/r5d_curve_lb64_b128_s128.log 2>&1
BENCH_HANKEL_STRIDE=256 timeout 4000 python bench.py 64 loopback64 64 \
  > $OUT/r5d_curve_lb64_b64_s256.log 2>&1
echo DONE
