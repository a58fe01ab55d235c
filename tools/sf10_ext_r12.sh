#!/bin/bash
set -x
cd /root/repo
SPARK_GRAFT_SF_DIR=/root/repo/sf10 SPARK_GRAFT_SF1=0 SPARK_GRAFT_REPS=3 \
SPARK_GRAFT_SUBSET=m16_letterbox,m17_silence_trim,m18_video_letterbox,p35_incremental_exact,p55_incremental_reingest,p34_ann_incremental,p77_annealing_mixture,p78_unseen_mass,q58_session_window,p53_unicode_dedup,p14_dedup_cluster,p11_ivf_knn \
  sbt -batch "runMain graft.Bench" > /tmp/sf10_ext.out 2>&1
echo SF10_EXT_DONE
