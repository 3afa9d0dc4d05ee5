#!/bin/bash
# One-shot TPU measurement backlog (round-3 tail — the axon tunnel was
# down when --grad-accum / --steps-per-dispatch / the VMEM gates landed).
# Run when the tunnel is back; results append to BENCH_BACKLOG.out.
# Usage:  bash tools/run_tpu_backlog.sh
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH="/root/repo:/root/.axon_site"
OUT=BENCH_BACKLOG.out
log() { echo "=== $* ($(date -u +%H:%M:%S))" | tee -a "$OUT"; }

log "bench.py (primary metric)"
timeout 900 python bench.py 2>&1 | tail -1 | tee -a "$OUT"

log "trainer-loop A/B: steps-per-dispatch 1 vs 4 (back-to-back)"
for K in 1 4 1 4; do
  timeout 900 python tools/bench_train_loop.py --steps-per-dispatch $K \
    --batches 40 2>&1 | tail -1 | tee -a "$OUT"
done

log "grad-accum cost at equal global batch (12 = 1x12 vs 4x3)"
for A in 1 4; do
  timeout 900 python tools/bench_train_loop.py --grad-accum $A \
    --batches 30 2>&1 | tail -1 | tee -a "$OUT"
done

log "decode bench"
timeout 900 python tools/bench_decode.py 2>&1 | tail -3 | tee -a "$OUT"

log "done — fold results into BENCH_NOTES.md / CLAUDE.md"
