#!/bin/bash
cd /root/repo
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
SPARK_GRAFT_BENCH_OUT=/root/repo/.logs/bench_${1:-run}.json \
sbt -batch "runMain graft.Bench" > /root/repo/.logs/bench_${1:-run}.log 2>&1
echo "bench rc=$? at $(date)" >> /root/repo/.logs/bench_${1:-run}.log
