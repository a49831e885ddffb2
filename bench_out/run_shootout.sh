#!/bin/bash
cd /root/repo
# wait for the main sweep to finish (one TPU process at a time)
while ! grep -q "SWEEP DONE" bench_out/sweep2.log 2>/dev/null; do sleep 60; done
for k in sync_convbank sync_exact; do
  for c in lte1024 lte2048 loopback64; do
    echo "=== $k $c ===" >> bench_out/shootout2.log
    timeout 3600 python bench_kernels.py $k $c >> bench_out/shootout2.log 2>> bench_out/shootout2.err
    echo "exit=$?" >> bench_out/shootout2.log
  done
done
echo "SHOOTOUT DONE" >> bench_out/shootout2.log
