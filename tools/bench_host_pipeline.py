#!/usr/bin/env python3
"""Host-pipeline feed-rate proof (VERDICT r3 weak #7): can the 1-vCPU
host's REAL data path — on-disk WAV decode (C++ native), bucketing,
batch assembly, int16 wire quantization, Prefetcher device_put — feed
the real-TPU train step?

Generates an on-disk corpus of ~8 s utterances (flagship AiShell-style
shapes: 800-frame bucket, batch 12), then measures:

  1. loader-only: iterate AudioBatchLoader on the host, no device work
     → the host's decode+assemble ceiling in utt/s;
  2. end-to-end: Prefetcher feeding the real jitted train step for
     ~2 epochs with deferred metric drains (the production loop);
  3. host-stall %: fraction of loop wall time the device spent idle
     waiting for batches (loop time vs the same number of steps fed
     from a resident batch).

Replaces the reference's "4-worker DataLoader keeps up" folklore
(utils/data_loader.py:217-220) with numbers.

  python tools/bench_host_pipeline.py                  # real TPU
  python tools/bench_host_pipeline.py --platform cpu --tiny   # smoke
"""

import argparse
import functools
import json
import os
import string
import sys
import time

sys.path.insert(0, ".")
sys.path.insert(0, "tests")

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--utts", type=int, default=240)
    ap.add_argument("--batch-size", type=int, default=12)
    ap.add_argument("--epochs", type=int, default=2)
    ap.add_argument("--num-workers", type=int, default=4)
    ap.add_argument("--platform", default=None)
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--corpus", default="/tmp/host_pipeline_corpus")
    args = ap.parse_args()

    if args.platform:
        os.environ["JAX_PLATFORMS"] = args.platform
    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    jax.config.update("jax_default_prng_impl", "rbg")

    from synth import make_corpus

    from __graft_entry__ import _flagship_cfg
    from end2end_asr_tpu.config import load_vocab
    from end2end_asr_tpu.data.dataset import ManifestDataset
    from end2end_asr_tpu.data.loader import (AudioBatchLoader,
                                             BucketingSampler, Prefetcher)
    from end2end_asr_tpu.models.transformer import (dims_from_config,
                                                    init_transformer)
    from end2end_asr_tpu.training.optimizer import init_adam_state
    from end2end_asr_tpu.training.steps import make_train_step

    B = args.batch_size
    n_utts = (args.utts // B) * B
    seconds = (6.5, 7.9) if not args.tiny else (0.4, 0.6)

    marker = os.path.join(args.corpus, f"done_{n_utts}_{seconds[1]}")
    if not os.path.exists(marker):
        rng = np.random.RandomState(0)
        texts = ["".join(rng.choice(list(string.ascii_lowercase + " "),
                                    size=rng.randint(15, 35)))
                 for _ in range(n_utts)]
        t0 = time.perf_counter()
        make_corpus(args.corpus, texts=texts, seconds=seconds, seed=1)
        open(marker, "w").close()
        print(json.dumps({"stage": "corpus_generated", "utts": n_utts,
                          "s": round(time.perf_counter() - t0, 1)}),
              flush=True)

    cfg = _flagship_cfg(tiny=args.tiny).replace(
        batch_size=B, num_workers=args.num_workers)
    label2id, id2label = load_vocab(
        os.path.join(args.corpus, "labels.json"))
    ds = ManifestDataset([os.path.join(args.corpus, "manifest.csv")],
                         label2id)
    dims = dims_from_config(cfg)

    def fresh_loader():
        return AudioBatchLoader(
            ds, cfg, sampler=BucketingSampler(len(ds), B, seed=7),
            seed=7, num_workers=args.num_workers)

    # ---- 1. loader-only host ceiling ----
    for _ in fresh_loader():  # warm OS page cache so disk IO isn't timed
        pass
    t0 = time.perf_counter()
    n, secs = 0, 0.0
    for batch in fresh_loader():
        n += batch.targets.shape[0]
        secs += batch.utt_seconds
    dt = time.perf_counter() - t0
    loader_utts = n / dt
    print(json.dumps({"stage": "loader_only", "utt_per_s": round(
        loader_utts, 1), "audio_rtf_x": round(secs / dt, 1),
        "num_workers": args.num_workers}), flush=True)

    # ---- train step setup ----
    num_vocab = len(label2id)
    params, state = jax.jit(functools.partial(
        init_transformer, cfg=cfg, num_vocab=num_vocab))(
            jax.random.PRNGKey(0))
    opt = init_adam_state(params)
    step = make_train_step(cfg, dims, from_pcm=True)
    rng = jax.random.PRNGKey(1)

    def run_epoch(loader):
        nonlocal params, opt, state, rng
        pending = []
        n = secs = steps = 0
        for batch in Prefetcher(loader):
            rng, sub = jax.random.split(rng)
            params, opt, state, m, hyp, gold = step(
                params, opt, state, sub, batch.pcm, batch.n_frames,
                batch.targets, batch.tgt_lengths,
                spect_T=batch.src_bucket)
            pending.append((m, hyp, gold))
            if len(pending) > 2:
                jax.device_get(pending.pop(0))
            n += batch.targets.shape[0]
            secs += batch.utt_seconds
            steps += 1
        for e in pending:
            jax.device_get(e)
        return n, secs, steps

    run_epoch(fresh_loader())  # warmup: compiles every touched bucket

    t0 = time.perf_counter()
    n = secs = steps = 0
    for _ in range(args.epochs):
        dn, dsecs, dsteps = run_epoch(fresh_loader())
        n += dn
        secs += dsecs
        steps += dsteps
    dt = time.perf_counter() - t0
    e2e_utts = n / dt
    print(json.dumps({"stage": "end_to_end_train", "utt_per_s": round(
        e2e_utts, 1), "audio_rtf_x": round(secs / dt, 1),
        "ms_per_step": round(1000 * dt / steps, 2), "steps": steps}),
        flush=True)

    # ---- 3. device-side floor for the same steps (resident batch) ----
    batch = next(iter(fresh_loader()))
    dev = jax.device_put((batch.pcm, batch.n_frames, batch.targets,
                          batch.tgt_lengths))
    params, opt, state, m, _, _ = step(params, opt, state, rng, *dev,
                                       spect_T=batch.src_bucket)
    float(m["loss"])
    t0 = time.perf_counter()
    for _ in range(steps):
        params, opt, state, m, _, _ = step(params, opt, state, rng, *dev,
                                           spect_T=batch.src_bucket)
    float(m["loss"])
    dev_dt = time.perf_counter() - t0
    stall_pct = max(0.0, 100.0 * (dt - dev_dt) / dt)
    print(json.dumps({
        "stage": "summary",
        "loader_only_utt_per_s": round(loader_utts, 1),
        "end_to_end_utt_per_s": round(e2e_utts, 1),
        "device_only_ms_per_step": round(1000 * dev_dt / steps, 2),
        "host_or_transfer_stall_pct": round(stall_pct, 1),
    }), flush=True)


if __name__ == "__main__":
    main()
