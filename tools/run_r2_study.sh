#!/bin/bash
# Round-2 capability study pipeline (single TPU process, sequential):
#   A. bf16 vs f32 convergence at 1500 epochs on the polyphonic corpus
#   T. teacher-forced training variant
#   B. 3x larger corpus (150 songs/style) for harder generalization
#   C. 3-class corpus: full per-pair switch matrix
# plus judges (classify.py) and evaluation harness runs for every model.
set -e
cd /root/repo
R=/tmp/r2
mkdir -p $R
CAD="--set test_step=100 --set save_step=500"

log() { echo "=== [$(date +%H:%M:%S)] $*"; }

[ -d $R/poly ] || python tools/make_demo_corpus.py $R/poly --songs-per-style 60 --chords
[ -d $R/big ]  || python tools/make_demo_corpus.py $R/big --songs-per-style 150 --chords --seed 1
[ -d $R/tri ]  || python tools/make_demo_corpus.py $R/tri --songs-per-style 60 --styles 3 --chords --seed 2

log "A1 f32 1500 epochs"
[ -f $R/vae_f32/history.json ] || python train.py --source $R/poly --output $R/vae_f32 --cache $R/cache_poly --epochs 1500 $CAD
log "A2 bf16 1500 epochs"
[ -f $R/vae_bf16/history.json ] || python train.py --source $R/poly --output $R/vae_bf16 --cache $R/cache_poly --epochs 1500 --set compute_dtype=bfloat16 $CAD
log "T teacher-forced 1500 epochs"
[ -f $R/vae_tf/history.json ] || python train.py --source $R/poly --output $R/vae_tf --cache $R/cache_poly --epochs 1500 --set teacher_force=True $CAD
log "B big corpus 2000 epochs"
[ -f $R/vae_big/history.json ] || python train.py --source $R/big --output $R/vae_big --cache $R/cache_big --epochs 2000 $CAD
log "C 3-class 1500 epochs"
[ -f $R/vae_tri/history.json ] || python train.py --source $R/tri --output $R/vae_tri --cache $R/cache_tri --classes style1,style2,style3 --epochs 1500 $CAD

log "W wide model (lstm_size=512, wide two-pass kernels) 1500 epochs"
[ -f $R/vae_wide/history.json ] || python train.py --source $R/poly --output $R/vae_wide --cache $R/cache_poly --epochs 1500 --set lstm_size=512 $CAD

log "XL 500-song corpus 2500 epochs"
[ -d $R/xl ] || python tools/make_demo_corpus.py $R/xl --songs-per-style 250 --chords --seed 3
[ -f $R/vae_xl/history.json ] || python train.py --source $R/xl --output $R/vae_xl --cache $R/cache_xl --epochs 2500 --set test_step=250 --set save_step=1250
[ -d $R/clf_xl/instrument ] || python classify.py --source $R/xl --output $R/clf_xl --cache $R/cache_xl --epochs 120

log "XXL 1000-song corpus 2500 epochs"
[ -d $R/xxl ] || python tools/make_demo_corpus.py $R/xxl --songs-per-style 500 --chords --seed 4
[ -f $R/vae_xxl/history.json ] || python train.py --source $R/xxl --output $R/vae_xxl --cache $R/cache_xxl --epochs 2500 --set test_step=250 --set save_step=1250
[ -d $R/clf_xxl/instrument ] || python classify.py --source $R/xxl --output $R/clf_xxl --cache $R/cache_xxl --epochs 120

log "judges"
[ -d $R/clf_poly/instrument ] || python classify.py --source $R/poly --output $R/clf_poly --cache $R/cache_poly --epochs 120
[ -d $R/clf_big/instrument ] || python classify.py --source $R/big --output $R/clf_big --cache $R/cache_big --epochs 120
[ -d $R/clf_tri/instrument ] || python classify.py --source $R/tri --output $R/clf_tri --cache $R/cache_tri --classes style1,style2,style3 --epochs 120

log "evaluations"
python evaluate.py --source $R/poly --model $R/vae_f32 --classifiers $R/clf_poly --output $R/eval_f32 --cache $R/cache_poly --sections autoencoding
python evaluate.py --source $R/poly --model $R/vae_bf16 --classifiers $R/clf_poly --output $R/eval_bf16 --cache $R/cache_poly --sections autoencoding
python evaluate.py --source $R/poly --model $R/vae_tf --classifiers $R/clf_poly --output $R/eval_tf --cache $R/cache_poly --sections autoencoding
python evaluate.py --source $R/poly --model $R/vae_wide --classifiers $R/clf_poly --output $R/eval_wide --cache $R/cache_poly --sections autoencoding
python evaluate.py --source $R/big --model $R/vae_big --classifiers $R/clf_big --output $R/eval_big --cache $R/cache_big --sections autoencoding
python evaluate.py --source $R/tri --model $R/vae_tri --classifiers $R/clf_tri --output $R/eval_tri --cache $R/cache_tri --sections autoencoding
python evaluate.py --source $R/xl --model $R/vae_xl --classifiers $R/clf_xl --output $R/eval_xl --cache $R/cache_xl --sections autoencoding
python evaluate.py --source $R/xxl --model $R/vae_xxl --classifiers $R/clf_xxl --output $R/eval_xxl --cache $R/cache_xxl --sections autoencoding

log "R2 STUDY DONE"
