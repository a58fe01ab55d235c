#!/bin/bash
# Round-12 final: full oracle sweep then full bench (serialized).
set -x
cd /root/repo
python3 tools/check_oracle.py /root/testdata/sf0.01 \
  > /tmp/oracle_sweep_r12.log 2>&1
echo "SWEEP_EXIT=$?"
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_REPS=3 \
  sbt -batch "runMain graft.Bench" > /tmp/bench_r12.out 2> /tmp/bench_r12.err
echo "BENCH_EXIT=$?"
echo FINAL_R12_DONE
