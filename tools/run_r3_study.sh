#!/bin/bash
# Round-3 per-head reconstruction study (single TPU process, sequential):
# train with ALL meta heads enabled (instrument + velocity + held-notes,
# the reference's fullest shipped decoder stack) on two corpora --
#   std:  the round-2 polyphonic synthetic corpus
#   hard: real-music statistics (mid-song tempo changes, 3 voices + drums,
#         velocity phrasing arcs, humanized off-grid onsets)
# -- so EVAL_REPORT can tabulate velocity MSE / held-note accuracy /
# instrument accuracy alongside notes accuracy, matching the metric set
# the reference's test() reports (vae_training.py:243-568).
set -e
cd /root/repo
R=/tmp/r3
mkdir -p $R
CAD="--set test_step=100 --set save_step=500"
HEADS="--set meta_held_notes=True"

log() { echo "=== [$(date +%H:%M:%S)] $*"; }

[ -d $R/std ]  || python tools/make_demo_corpus.py $R/std  --songs-per-style 60 --chords --seed 5
[ -d $R/hard ] || python tools/make_demo_corpus.py $R/hard --songs-per-style 60 --hard   --seed 5

log "H1 std corpus, all heads, 2000 epochs"
[ -f $R/vae_std_heads/history.json ] || python train.py --source $R/std \
  --output $R/vae_std_heads --cache $R/cache_std --epochs 2000 $CAD $HEADS
log "H2 hard corpus, all heads, 2000 epochs"
[ -f $R/vae_hard_heads/history.json ] || python train.py --source $R/hard \
  --output $R/vae_hard_heads --cache $R/cache_hard --epochs 2000 $CAD $HEADS

log "judges + autoencoding evaluation (style metrics on the hard corpus)"
[ -d $R/clf_hard/instrument ] || python classify.py --source $R/hard \
  --output $R/clf_hard --cache $R/cache_hard --epochs 120
python evaluate.py --source $R/hard --model $R/vae_hard_heads \
  --classifiers $R/clf_hard --output $R/eval_hard --cache $R/cache_hard \
  --sections autoencoding

log "R3 STUDY DONE"
