#!/bin/bash
set -x
cd /root/repo
sbt -batch test > /tmp/seal_test.log 2>&1
echo "TEST_EXIT=$?"
python3 tools/check_oracle.py /root/testdata/sf0.01 \
  > /tmp/seal_sweep.log 2>&1
echo "SWEEP_EXIT=$?"
echo SEAL_DONE
