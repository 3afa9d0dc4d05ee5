#!/usr/bin/env python3
"""End-to-end TRAINER-loop throughput A/B (real chip): loader iteration +
prefetch + dispatch + deferred metric drains, i.e. everything
bench.py's pure-step pipeline does NOT measure. Purpose-built to
quantify --steps-per-dispatch K (training/steps.py make_multi_train_step)
and the deferred-drain pipeline against the tunnel's per-dispatch cost.

Feeds the flagship AiShell README config (vgg_cnn/4L/8H/512, batch 12,
~8 s utterances) from PRE-BUILT in-memory batches — audio decode and
bucketing are deliberately excluded so the A/B isolates the dispatch
path (the host-side loader cost is identical across modes and measured
separately by tests/test_loader timings).

  python tools/bench_train_loop.py                 # K=1 baseline
  python tools/bench_train_loop.py --steps-per-dispatch 4

Prints one JSON line per run: utt/s end-to-end and ms/step.
"""

import argparse
import functools
import json
import sys
import time

sys.path.insert(0, ".")

import numpy as np


class PrebuiltLoader:
    """Duck-typed stand-in for AudioBatchLoader over fixed batches."""

    def __init__(self, batches):
        self.batches = batches

    def __iter__(self):
        return iter(self.batches)

    def __len__(self):
        return len(self.batches)

    def shuffle(self, epoch):
        pass


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps-per-dispatch", type=int, default=1)
    ap.add_argument("--grad-accum", type=int, default=1)
    ap.add_argument("--batches", type=int, default=60)
    ap.add_argument("--batch-size", type=int, default=12)
    ap.add_argument("--frames", type=int, default=800)
    ap.add_argument("--tgt-len", type=int, default=48)
    ap.add_argument("--platform", default=None,
                    help="e.g. cpu for a smoke run (default: real TPU)")
    ap.add_argument("--tiny", action="store_true",
                    help="2L/64-dim model for CPU smoke runs")
    args = ap.parse_args()

    import os
    if args.platform:
        os.environ["JAX_PLATFORMS"] = args.platform
    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    jax.config.update("jax_default_prng_impl", "rbg")

    from __graft_entry__ import _flagship_cfg, _synthetic_batch
    from end2end_asr_tpu.data.loader import Batch
    from end2end_asr_tpu.models.transformer import init_transformer
    from end2end_asr_tpu.training.optimizer import init_adam_state
    from end2end_asr_tpu.training.trainer import Trainer

    cfg = _flagship_cfg(tiny=args.tiny).replace(
        batch_size=args.batch_size,
        steps_per_dispatch=args.steps_per_dispatch,
        grad_accum=args.grad_accum,
        epochs=1, save_every=10**9, shuffle=False)
    num_vocab = 64 if args.tiny else 4336  # AiShell label-set size
    B, T, U = args.batch_size, args.frames, args.tgt_len

    batches = []
    for i in range(args.batches):
        pcm, n_frames, targets, tgt_lengths = _synthetic_batch(
            cfg, B, T, U, seed=i)
        batches.append(Batch(
            pcm=pcm, spect=None, n_frames=n_frames, src_bucket=T,
            targets=targets, tgt_lengths=tgt_lengths,
            src_percentages=np.ones(B, np.float32),
            utt_seconds=B * T * cfg.hop_length / cfg.sample_rate))

    params, state = jax.jit(functools.partial(
        init_transformer, cfg=cfg, num_vocab=num_vocab))(
            jax.random.PRNGKey(0))
    opt = init_adam_state(params)
    id2label = {i: chr(ord("a") + (i % 26)) for i in range(num_vocab)}

    # CER/WER host decoding off the hot path (it is pure logging), and
    # checkpoint saves no-opped (a flagship save pulls ~300 MB through
    # the 50 MB/s tunnel — pure noise for a dispatch A/B):
    from end2end_asr_tpu.training import trainer as trainer_mod
    trainer_mod.ckpt.save_checkpoint = lambda *a, **k: None
    trainer = Trainer(cfg, {}, id2label, metrics_every=10**9)

    # warmup epoch: compile BOTH programs the timed run will use — two
    # full K-groups plus one extra batch so the partial-group fallback's
    # single-step program also compiles outside the timed window
    n_warm = (max(4, 2 * args.steps_per_dispatch + 1)
              if args.steps_per_dispatch > 1 else 4)
    warm = PrebuiltLoader(batches[:n_warm])
    params, opt, state, _ = trainer.train(
        params, opt, state, warm, [], start_epoch=0, num_epochs=1,
        prefetch=True)

    t0 = time.perf_counter()
    params, opt, state, _ = trainer.train(
        params, opt, state, PrebuiltLoader(batches), [],
        start_epoch=0, num_epochs=1, prefetch=True)
    # trainer drains every pending metric before returning — wall time
    # covers all dispatched work
    dt = time.perf_counter() - t0

    n_utts = args.batches * B
    print(json.dumps({
        "metric": "train_loop_utts_per_sec",
        "value": round(n_utts / dt, 1),
        "ms_per_step": round(1000 * dt / args.batches, 2),
        "steps_per_dispatch": args.steps_per_dispatch,
        "grad_accum": args.grad_accum,
        "batches": args.batches,
        "unit": "utt/s",
    }))


if __name__ == "__main__":
    main()
