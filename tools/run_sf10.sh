#!/bin/bash
# Round-11 decade stress (VERDICT r10 item 1): the ~15 heaviest gates
# at the 100x fixture, 3 reps, bench protocol. Log: target/sf10_bench.log
cd /root/repo
export SPARK_DRIVER_MEM=48g
export SPARK_GRAFT_SF_DIR=/root/repo/sf10
export SPARK_GRAFT_REPS=3
export SPARK_GRAFT_SUBSET=m08_video_neardup,m13_image_dedup_cluster,p05_minhash_lsh,p07_simhash,p24_embed_lsh_adaptive,p30_incremental_dedup,p31_simhash_wide,p33_ivf_pq_probe,p51_bm25_topk,p56_semantic_decontam,p60_source_overlap,p66_incremental_components,p69_setsim_join,p72_kmeans_semdedup,p79_threshold_sweep
sbt -batch "runMain graft.Bench" > /root/repo/target/sf10_bench.log 2>&1
echo "EXIT=$?" >> /root/repo/target/sf10_bench.log
