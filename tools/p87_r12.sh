#!/bin/bash
set -x
cd /root/repo
export SPARK_GRAFT_SF1=0
SPARK_GRAFT_SF_DIR=/root/repo/sf1 SPARK_GRAFT_SUBSET=p87_containment_incremental \
  SPARK_GRAFT_REPS=3 sbt -batch "runMain graft.Bench" > /tmp/p87_sf1.out 2>&1
SPARK_GRAFT_SF_DIR=/root/repo/sf10 SPARK_GRAFT_SUBSET=p87_containment_incremental \
  SPARK_GRAFT_REPS=3 sbt -batch "runMain graft.Bench" > /tmp/p87_sf10.out 2>&1
echo P87_DONE
