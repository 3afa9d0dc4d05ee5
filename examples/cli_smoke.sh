#!/bin/bash
# End-to-end CLI smoke: train → resume → test (greedy + beam) →
# transcribe → lm_train → LM-rescored test, all through the real entry
# points on CPU with a tiny synthetic corpus. Pins the drop-in CLI
# contract (reference README.md:44-97) as the suite grows. ~2-4 min.
#
#   bash examples/cli_smoke.sh            # uses a temp dir
#   bash examples/cli_smoke.sh /some/dir  # keep artifacts there
set -euo pipefail

REPO="$(cd "$(dirname "$0")/.." && pwd)"
WORK="${1:-$(mktemp -d)}"
mkdir -p "$WORK"
cd "$WORK"
export JAX_PLATFORMS=cpu
export PYTHONPATH="$REPO"
PY=(python)
MODEL_FLAGS=(--feat_extractor "" --num-layers 2 --num-heads 4
             --dim-model 128 --dim-key 32 --dim-value 32 --dim-inner 256
             --dim-emb 128 --batch-size 4 --dtype float32)

echo "== corpus"
"${PY[@]}" -c "
import sys; sys.path[:0] = ['$REPO', '$REPO/tests']
import jax; jax.config.update('jax_platforms', 'cpu')
from synth import make_corpus
texts = ['abba cab', 'cab back abba', 'back cabba cab', 'cabba abba',
         'cab cab back', 'abba back', 'back back cabba', 'cabba cab abba']
make_corpus('corpus', texts=texts, exact_samples=63*160)"

echo "== train 2 epochs"
"${PY[@]}" "$REPO/train.py" \
  --train-manifest-list corpus/manifest.csv \
  --valid-manifest-list corpus/manifest.csv \
  --labels-path corpus/labels.json --name smoke --save-folder models \
  "${MODEL_FLAGS[@]}" --epochs 2 --save-every 1
test -f models/smoke/epoch_2.npz

echo "== resume to epoch 3"
"${PY[@]}" "$REPO/train.py" \
  --train-manifest-list corpus/manifest.csv \
  --valid-manifest-list corpus/manifest.csv \
  --labels-path corpus/labels.json --name smoke --save-folder models \
  "${MODEL_FLAGS[@]}" --epochs 3 --save-every 1 \
  --continue-from models/smoke/epoch_2
test -f models/smoke/epoch_3.npz

echo "== test.py greedy"
"${PY[@]}" "$REPO/test.py" --continue-from models/smoke/best_model \
  --test-manifest-list corpus/manifest.csv --batch-size 4 \
  | grep "TEST CER"

echo "== test.py beam-4"
"${PY[@]}" "$REPO/test.py" --continue-from models/smoke/best_model \
  --test-manifest-list corpus/manifest.csv --batch-size 4 \
  --beam-search --beam-width 4 | grep "TEST CER"

echo "== transcribe.py"
WAV=$(head -1 corpus/manifest.csv | cut -d, -f1)
"${PY[@]}" "$REPO/transcribe.py" --continue-from models/smoke/best_model \
  "$WAV" | tail -1

echo "== lm_train.py"
"${PY[@]}" "$REPO/lm_train.py" \
  --train-manifest-list corpus/manifest.csv \
  --lm-path models/lm.npz \
  --epochs 2 --batch-size 2 --ninp 32 --nhid 64 --nlayers 1 --bptt 8
test -f models/lm.npz

echo "== test.py beam-4 + LM rescoring"
"${PY[@]}" "$REPO/test.py" --continue-from models/smoke/best_model \
  --test-manifest-list corpus/manifest.csv --batch-size 4 \
  --beam-search --beam-width 4 --lm-rescoring --lm-path models/lm.npz \
  --lm-weight 0.1 | grep "TEST CER"

echo "== test.py int8 weight-only PTQ (--quantize-int8)"
"${PY[@]}" "$REPO/test.py" --continue-from models/smoke/best_model \
  --test-manifest-list corpus/manifest.csv --batch-size 4 \
  --quantize-int8 | grep "TEST CER"

echo "== train 1 epoch tensor+sequence-parallel (8 virtual devices)"
XLA_FLAGS="--xla_force_host_platform_device_count=8" \
"${PY[@]}" "$REPO/train.py" \
  --train-manifest-list corpus/manifest.csv \
  --valid-manifest-list corpus/manifest.csv \
  --labels-path corpus/labels.json --name smoke_sp --save-folder models \
  "${MODEL_FLAGS[@]}" --epochs 1 --save-every 1 \
  --parallel --mesh-model 2 --seq-parallel
test -f models/smoke_sp/epoch_1.npz

echo "SMOKE OK ($WORK)"
