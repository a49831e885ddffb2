#!/bin/bash
cd /root/repo
OUT=bench_out
set -x
timeout 3000 python bench_stages_synced.py rxonly loopback64 64 > $OUT/r5d_rxonly_loopback64.log 2>&1
timeout 3000 python bench_stages_synced.py rxonly lte1024 64 > $OUT/r5d_rxonly_lte1024.log 2>&1
timeout 3000 python bench_stages_synced.py rxonly lte2048 32 > $OUT/r5d_rxonly_lte2048.log 2>&1
timeout 4000 python bench.py 32 lte1024 32 > $OUT/r5e_bench_lte1024.log 2>&1
timeout 4000 python bench.py 32 lte2048 16 > $OUT/r5e_bench_lte2048.log 2>&1
echo DONE
