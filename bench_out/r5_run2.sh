#!/bin/bash
# round-5 TPU run 2: loopback64/lte2048 chain benches, verified streaming
# serving shapes (B-monotonicity at fixed chunk, dft demod), the four
# generation rows, lte2048 stage accounting, loopback64 batch x Hankel-stride
# curve.  One timed program per process; strictly sequential.
cd /root/repo
OUT=bench_out
set -x
# chain benches for the other two configs (default paths)
timeout 4000 python bench.py 16 loopback64 128 > $OUT/r5_bench_loopback64.log 2>&1
timeout 4000 python bench.py 32 lte2048 16 > $OUT/r5_bench_lte2048.log 2>&1
BENCH_TX_PATH=fourstep timeout 4000 python bench.py 32 lte2048 16 \
  > $OUT/r5_bench_lte2048_tx4.log 2>&1
# verified streaming: single-stream baseline, then B-monotonicity at fixed
# chunk/K, then the r4 regression shape re-measured with the dft demod
timeout 4000 python bench_streaming_verified.py lte1024 65280 16 1 \
  > $OUT/r5_vstream_lte1024_b1.log 2>&1
timeout 4000 python bench_streaming_verified.py lte1024 65280 4 4 \
  > $OUT/r5_vstream_lte1024_b4.log 2>&1
timeout 4000 python bench_streaming_verified.py lte1024 65280 4 16 \
  > $OUT/r5_vstream_lte1024_b16.log 2>&1
timeout 4000 python bench_streaming_verified.py lte1024 65280 4 1 \
  > $OUT/r5_vstream_lte1024_b1k4.log 2>&1
timeout 4000 python bench_streaming_verified.py lte1024 4080 16 16 \
  > $OUT/r5_vstream_lte1024_smallchunk_b16.log 2>&1
BENCH_DEMOD_PATH=fft timeout 4000 python bench_streaming_verified.py \
  lte1024 65280 4 16 > $OUT/r5_vstream_lte1024_b16_fft.log 2>&1
timeout 4000 python bench_streaming_verified.py loopback64 65520 4 16 \
  > $OUT/r5_vstream_loopback64_b16.log 2>&1
# the four generation rows (each its own subprocess via the driver)
timeout 14000 python bench_generations.py driver > $OUT/r5_generations.log 2>&1
# lte2048 stage accounting AFTER the round-4 blocked-demod fix
timeout 14000 python bench_stages_synced.py driver lte2048 32 \
  > $OUT/r5_stages_lte2048.log 2>&1
# loopback64 batch x Hankel-stride utilisation curve
for b in 16 32 64; do
  timeout 4000 python bench.py $b loopback64 64 \
    > $OUT/r5_curve_lb64_b${b}_s64.log 2>&1
done
BENCH_HANKEL_STRIDE=128 timeout 3000 python bench_roofline.py loopback64 \
  --batch 16 --update-constants > $OUT/r5_roof_lb64_s128.log 2>&1
for b in 16 32; do
  BENCH_HANKEL_STRIDE=128 timeout 4000 python bench.py $b loopback64 64 \
    > $OUT/r5_curve_lb64_b${b}_s128.log 2>&1
done
echo DONE
