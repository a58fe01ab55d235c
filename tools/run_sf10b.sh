#!/bin/bash
# Round-11 decade stress, extension: span/chunk dedup family + exact
# dedup + LM scoring + the new p83 containment join at sf10.
cd /root/repo
export SPARK_DRIVER_MEM=48g
export SPARK_GRAFT_SF_DIR=/root/repo/sf10
export SPARK_GRAFT_REPS=3
export SPARK_GRAFT_SUBSET=p02_exact_dedup,p20_decontam,p22_unigram_lm,p36_repeated_spans,p42_span_removal,p61_chunk_dedup,p74_cdc_chunks,p76_winnowing,p81_bpe_train,p82_bpe_segment,p83_containment_join
sbt -batch "runMain graft.Bench" > /root/repo/target/sf10b_bench.log 2>&1
echo "EXIT=$?" >> /root/repo/target/sf10b_bench.log
