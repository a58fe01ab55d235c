#!/bin/bash
# Round-12 sf10 measurement chain (serialized; timing-quality runs).
set -x
cd /root/repo
export SPARK_GRAFT_SF_DIR=/root/repo/sf10
export SPARK_GRAFT_SF1=0

# A) m13 variance: 5 idle reps (VERDICT r11 item 7)
SPARK_GRAFT_SUBSET=m13_image_dedup_cluster SPARK_GRAFT_REPS=5 \
  sbt -batch "runMain graft.Bench" > /tmp/sf10_m13.out 2> /tmp/sf10_m13.err

# B) decade stress for the not-yet-stressed heavy gates (item 8)
SPARK_GRAFT_SUBSET=m14_audio_neardup,m15_crossmodal_dup,p65_pagerank,p67_personalized_pagerank,p60_source_overlap \
  SPARK_GRAFT_REPS=3 \
  sbt -batch "runMain graft.Bench" > /tmp/sf10_new.out 2> /tmp/sf10_new.err

# C) screen-vs-exact containment + BPE at sf10 (items 3/5 evidence)
SPARK_GRAFT_SUBSET=p83_containment_join,p85_containment_screen,p86_bpe_batched,p81_bpe_train \
  SPARK_GRAFT_REPS=3 \
  sbt -batch "runMain graft.Bench" > /tmp/sf10_screen.out 2> /tmp/sf10_screen.err

# D) sf1 medians for the round-12 gates (decade-ratio denominators)
SPARK_GRAFT_SF_DIR=/root/repo/sf1 \
  SPARK_GRAFT_SUBSET=p83_containment_join,p85_containment_screen,p86_bpe_batched,p81_bpe_train \
  SPARK_GRAFT_REPS=3 \
  sbt -batch "runMain graft.Bench" > /tmp/sf1_screen.out 2> /tmp/sf1_screen.err

echo SF10CHAIN_DONE
