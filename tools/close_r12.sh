#!/bin/bash
set -x
cd /root/repo
sbt -batch test > /tmp/close_test.log 2>&1
echo "TEST_EXIT=$?"
python3 tools/check_oracle.py /root/testdata/sf0.01 \
  > /tmp/oracle_sweep_r12.log 2>&1
echo "SWEEP_EXIT=$?"
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_REPS=3 \
  sbt -batch "runMain graft.Bench" > /tmp/bench_close.out 2>&1
echo "BENCH_EXIT=$?"
echo CLOSE_R12_DONE
