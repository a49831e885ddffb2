#!/bin/bash
cd /root/repo
for c in loopback64 lte1024 lte2048; do
  echo "=== bench $c ===" >> bench_out/sweep2.log
  timeout 5400 python bench.py 16 $c >> bench_out/sweep2.log 2> bench_out/$c.err
  echo "exit=$?" >> bench_out/sweep2.log
done
for c in loopback64 lte1024 lte2048; do
  echo "=== roofline $c ===" >> bench_out/sweep2.log
  timeout 5400 python bench_roofline.py $c >> bench_out/sweep2.log 2> bench_out/roofline_$c.err
  echo "exit=$?" >> bench_out/sweep2.log
done
echo "SWEEP DONE" >> bench_out/sweep2.log
