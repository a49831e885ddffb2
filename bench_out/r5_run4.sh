#!/bin/bash
# round-5 TPU run 4b (final numbers): constants for the settled sources
# (conv kernel + new loopback64 defaults), driver-default runs, A/Bs, probes.
cd /root/repo
OUT=bench_out
set -x
for c in loopback64 lte1024 lte2048; do
  timeout 3000 python bench_roofline.py $c --batch 16 --update-constants \
    > $OUT/r5c_roof_${c}.log 2>&1
done
BENCH_CHAN_PATH=xla timeout 3000 python bench_roofline.py lte1024 --batch 16 \
  --update-constants > $OUT/r5c_roof_lte1024_chanxla.log 2>&1
# the exact driver artifact shape: python bench.py (defaults)
timeout 4000 python bench.py > $OUT/r5c_bench_driver_default.log 2>&1
timeout 4000 python bench.py 32 lte1024 32 > $OUT/r5c_bench_lte1024.log 2>&1
BENCH_CHAN_PATH=xla timeout 4000 python bench.py 32 lte1024 32 \
  > $OUT/r5c_bench_lte1024_chanxla.log 2>&1
timeout 4000 python bench.py 32 lte2048 16 > $OUT/r5c_bench_lte2048.log 2>&1
timeout 4000 python bench.py 128 loopback64 32 \
  > $OUT/r5c_curve_lb64_b128_s128.log 2>&1
BENCH_HANKEL_STRIDE=256 timeout 3000 python bench_roofline.py loopback64 \
  --batch 16 --update-constants > $OUT/r5c_roof_lb64_s256.log 2>&1
BENCH_HANKEL_STRIDE=256 timeout 4000 python bench.py 64 loopback64 64 \
  > $OUT/r5c_curve_lb64_b64_s256.log 2>&1
echo DONE
