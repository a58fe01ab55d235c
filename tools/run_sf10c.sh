#!/bin/bash
# Round-11 decade stress, core-SQL extension: representative q-gates
# (agg/join/window/rollup/rangejoin/pivot/grouping/HLL) at sf10.
cd /root/repo
export SPARK_DRIVER_MEM=48g
export SPARK_GRAFT_SF_DIR=/root/repo/sf10
export SPARK_GRAFT_REPS=3
export SPARK_GRAFT_SUBSET=q01_agg,q03_join_topk,q04_window,q11_rollup,q17_join6,q28_rangejoin_auto,q30_topk_per_key,q36_bucketed_join,q44_range_window,q46_hll_merge,q48_grouping_sets,q49_stats_agg
sbt -batch "runMain graft.Bench" > /root/repo/target/sf10c_bench.log 2>&1
echo "EXIT=$?" >> /root/repo/target/sf10c_bench.log
