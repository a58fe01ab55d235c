#!/bin/bash
set -x
cd /root/repo
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_REPS=3 \
  sbt -batch "runMain graft.Bench" > /tmp/bench_recut.out 2>&1
echo "BENCH_EXIT=$?"
export SPARK_GRAFT_SF1=0
SPARK_GRAFT_SF_DIR=/root/repo/sf1 SPARK_GRAFT_REPS=3 \
  SPARK_GRAFT_SUBSET=p81_bpe_train,p86_bpe_batched,p88_bpe_deep \
  sbt -batch "runMain graft.Bench" > /tmp/bpe_sf1.out 2>&1
SPARK_GRAFT_SF_DIR=/root/repo/sf10 SPARK_GRAFT_REPS=3 \
  SPARK_GRAFT_SUBSET=p81_bpe_train,p86_bpe_batched,p88_bpe_deep \
  sbt -batch "runMain graft.Bench" > /tmp/bpe_sf10.out 2>&1
echo RECUT_DONE
