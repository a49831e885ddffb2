#!/bin/bash
# round-5 TPU run 3 (final): constants for the current sources (packed-norm
# sync kernel, row-tiled equalize, batched demod, fused TX), chain benches
# at all three configs incl. A/Bs, loopback64 batch x Hankel-stride curve,
# packed-norm sync stage rows, batched generation rows.
cd /root/repo
OUT=bench_out
set -x
for c in loopback64 lte1024 lte2048; do
  timeout 3000 python bench_roofline.py $c --batch 16 --update-constants \
    > $OUT/r5b_roof_${c}.log 2>&1
done
for c in lte1024 lte2048 loopback64; do
  BENCH_TX_PATH=fused timeout 3000 python bench_roofline.py $c --batch 16 \
    --update-constants > $OUT/r5b_roof_${c}_txfused.log 2>&1
done
BENCH_HANKEL_STRIDE=128 timeout 3000 python bench_roofline.py loopback64 \
  --batch 16 --update-constants > $OUT/r5b_roof_lb64_s128.log 2>&1
BENCH_BATCH_DEMOD=0 timeout 3000 python bench_roofline.py lte1024 \
  --batch 16 --update-constants > $OUT/r5b_roof_lte1024_nobd.log 2>&1
# packed-norm sync kernel stage rows
timeout 3000 python bench_stages_synced.py syncpallas lte2048 32 \
  > $OUT/r5b_stage_syncpallas_lte2048.log 2>&1
timeout 3000 python bench_stages_synced.py syncpallas lte1024 64 \
  > $OUT/r5b_stage_syncpallas_lte1024.log 2>&1
timeout 3000 python bench_stages_synced.py txfused lte1024 64 \
  > $OUT/r5_stage_txfused_lte1024.log 2>&1
# chain benches (default = pallas TX + pallas sync + pallas eq + batched demod)
timeout 4000 python bench.py 32 lte1024 32 > $OUT/r5b_bench_lte1024.log 2>&1
BENCH_BATCH_DEMOD=0 timeout 4000 python bench.py 32 lte1024 32 \
  > $OUT/r5b_bench_lte1024_nobd.log 2>&1
BENCH_TX_PATH=fused timeout 4000 python bench.py 32 lte1024 32 \
  > $OUT/r5b_bench_lte1024_txfused.log 2>&1
timeout 4000 python bench.py 32 lte2048 16 > $OUT/r5b_bench_lte2048.log 2>&1
BENCH_TX_PATH=fused timeout 4000 python bench.py 32 lte2048 16 \
  > $OUT/r5b_bench_lte2048_txfused.log 2>&1
timeout 4000 python bench.py 16 loopback64 128 \
  > $OUT/r5b_bench_loopback64.log 2>&1
# loopback64 batch x Hankel-stride curve
for b in 16 32 64; do
  timeout 4000 python bench.py $b loopback64 64 \
    > $OUT/r5b_curve_lb64_b${b}_s64.log 2>&1
done
for b in 16 32 64; do
  BENCH_HANKEL_STRIDE=128 timeout 4000 python bench.py $b loopback64 64 \
    > $OUT/r5b_curve_lb64_b${b}_s128.log 2>&1
done
BENCH_GEN_BATCH=16 timeout 14000 python bench_generations.py driver \
  > $OUT/r5_generations_b16.log 2>&1
echo DONE
