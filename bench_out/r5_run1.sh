#!/bin/bash
# round-5 TPU run 1 (v2): regenerate constants (compile-only), TX stage
# shootout (ifft vs pallas vs fourstep), lte1024 chain benches.
# One timed program per process; strictly sequential.
cd /root/repo
OUT=bench_out
set -x
for c in loopback64 lte1024 lte2048; do
  timeout 3000 python bench_roofline.py $c --batch 16 --update-constants \
    > $OUT/r5_roof_${c}.log 2>&1
done
for c in lte1024 loopback64 lte2048; do
  BENCH_TX_PATH=xla timeout 3000 python bench_roofline.py $c --batch 16 \
    --update-constants > $OUT/r5_roof_${c}_txxla.log 2>&1
done
for c in lte1024 lte2048; do
  BENCH_TX_PATH=fourstep timeout 3000 python bench_roofline.py $c --batch 16 \
    --update-constants > $OUT/r5_roof_${c}_tx4.log 2>&1
done
for st in txifft txpallas txfourstep; do
  timeout 3000 python bench_stages_synced.py $st lte1024 64 \
    > $OUT/r5_stage_${st}_lte1024.log 2>&1
done
timeout 4000 python bench.py 32 lte1024 32 > $OUT/r5_bench_lte1024.log 2>&1
BENCH_TX_PATH=fourstep timeout 4000 python bench.py 32 lte1024 32 \
  > $OUT/r5_bench_lte1024_tx4.log 2>&1
BENCH_TX_PATH=xla timeout 4000 python bench.py 32 lte1024 32 \
  > $OUT/r5_bench_lte1024_txxla.log 2>&1
BENCH_TX_INVARIANT=1 timeout 4000 python bench.py 32 lte1024 32 \
  > $OUT/r5_bench_lte1024_licm.log 2>&1
echo DONE
