#!/usr/bin/env python3
"""Decompose the trainer-loop vs pure-step gap (round 4).

BENCH_BACKLOG round-3/4 fact: bench.py's pipelined pure step is ~16 ms
but tools/bench_train_loop.py measures ~1000 ms/step, and
--steps-per-dispatch 4 does NOT help — so the cost is not the per-
dispatch metrics pull. This probe times each suspect in isolation on
the real chip:

  1. steady-state host read RTT (device_get of a scalar, done compute)
  2. device_put bandwidth for one flagship batch (12 x 800f PCM ~ 6 MB)
  3. N train_step dispatches, SAME device-resident batch, sync at end
     (bench.py-style, but through the real make_train_step program)
  4. same, but each step consumes a FRESH device_put batch (prefetch
     thread, like the trainer)
  5. same as 4 plus a per-step device_get of (metrics, hyp, gold)
     (the trainer's drain, depth-2 deferred)

Prints one JSON line per stage.
"""

import argparse
import functools
import json
import queue
import sys
import threading
import time

sys.path.insert(0, ".")

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--batch-size", type=int, default=12)
    ap.add_argument("--frames", type=int, default=800)
    ap.add_argument("--tgt-len", type=int, default=48)
    ap.add_argument("--platform", default=None)
    ap.add_argument("--tiny", action="store_true")
    args = ap.parse_args()

    import os
    if args.platform:
        os.environ["JAX_PLATFORMS"] = args.platform
    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    jax.config.update("jax_default_prng_impl", "rbg")
    import jax.numpy as jnp

    from __graft_entry__ import _flagship_cfg, _synthetic_batch
    from end2end_asr_tpu.models.transformer import (dims_from_config,
                                                    init_transformer)
    from end2end_asr_tpu.training.optimizer import init_adam_state
    from end2end_asr_tpu.training.steps import make_train_step

    cfg = _flagship_cfg(tiny=args.tiny)
    num_vocab = 64 if args.tiny else 4336
    B, T, U = args.batch_size, args.frames, args.tgt_len
    N = args.steps

    def emit(stage, ms, extra=None):
        rec = {"stage": stage, "ms": round(ms, 2)}
        rec.update(extra or {})
        print(json.dumps(rec), flush=True)

    # ---- 1. steady-state scalar read RTT ----
    one = jax.device_put(np.float32(1.0))
    two = jax.jit(lambda x: x + 1)(one)
    float(two)  # compile+warm
    t0 = time.perf_counter()
    reps = 20
    for _ in range(reps):
        float(two)  # value already computed: pure host-read round trip
    emit("scalar_read_rtt", 1000 * (time.perf_counter() - t0) / reps)

    # ---- 2. device_put of one flagship batch ----
    pcm, n_frames, targets, tgt_lengths = _synthetic_batch(
        cfg, B, T, U, seed=0)
    nbytes = pcm.nbytes + targets.nbytes
    for _ in range(2):  # warm any layout/transfer path
        h = jax.device_put(pcm)
        _ = np.asarray(h[0, :1])  # force completion with a host read
    t0 = time.perf_counter()
    reps = 5
    for _ in range(reps):
        h = jax.device_put(pcm)
        _ = np.asarray(h[0, :1])
    emit("device_put_batch", 1000 * (time.perf_counter() - t0) / reps,
         {"mbytes": round(nbytes / 1e6, 2)})

    # ---- train step setup ----
    params, state = jax.jit(functools.partial(
        init_transformer, cfg=cfg, num_vocab=num_vocab))(
            jax.random.PRNGKey(0))
    opt = init_adam_state(params)
    step = make_train_step(cfg, dims_from_config(cfg), from_pcm=True)
    rng = jax.random.PRNGKey(1)

    def fresh_host_batch(i):
        return _synthetic_batch(cfg, B, T, U, seed=i)

    dev_batch = jax.device_put((pcm, n_frames, targets, tgt_lengths))

    def run_step(p, o, s, batch, r):
        a, nf, tg, tl = batch
        p, o, s, m, hyp, gold = step(p, o, s, r, a, nf, tg, tl, spect_T=T)
        return p, o, s, (m, hyp, gold)

    # warm compile
    params, opt, state, out = run_step(params, opt, state, dev_batch, rng)
    _ = jax.device_get(out[0]["loss"])

    # ---- 3. dispatch-only, resident batch ----
    t0 = time.perf_counter()
    for i in range(N):
        params, opt, state, out = run_step(params, opt, state, dev_batch,
                                           rng)
    _ = float(out[0]["loss"])  # sync once
    emit("loop_resident_batch", 1000 * (time.perf_counter() - t0) / N)

    # ---- 4. fresh device_put batch per step (prefetch thread) ----
    q: "queue.Queue" = queue.Queue(maxsize=2)

    def producer(n):
        for i in range(n):
            q.put(jax.device_put(fresh_host_batch(i)))
        q.put(None)

    th = threading.Thread(target=producer, args=(N,), daemon=True)
    t0 = time.perf_counter()
    th.start()
    while True:
        b = q.get()
        if b is None:
            break
        params, opt, state, out = run_step(params, opt, state, b, rng)
    _ = float(out[0]["loss"])
    emit("loop_fresh_batches", 1000 * (time.perf_counter() - t0) / N)

    # ---- 5. + per-step deferred metric drain (depth 2) ----
    th = threading.Thread(target=producer, args=(N,), daemon=True)
    pending = []
    t0 = time.perf_counter()
    th.start()
    while True:
        b = q.get()
        if b is None:
            break
        params, opt, state, out = run_step(params, opt, state, b, rng)
        pending.append(out)
        if len(pending) > 2:
            jax.device_get(pending.pop(0))
    for out in pending:
        jax.device_get(out)
    emit("loop_fresh_plus_drain", 1000 * (time.perf_counter() - t0) / N)

    # ---- 6. EXACT trainer mechanics: real Prefetcher (per-field
    # device_put of a Batch), per-step rng split, depth-2 drain ----
    from end2end_asr_tpu.data.loader import Batch, Prefetcher

    host_batches = []
    for i in range(N):
        p_, nf_, tg_, tl_ = fresh_host_batch(i)
        host_batches.append(Batch(
            pcm=p_, spect=None, n_frames=nf_, src_bucket=T,
            targets=tg_, tgt_lengths=tl_,
            src_percentages=np.ones(B, np.float32),
            utt_seconds=B * T * cfg.hop_length / cfg.sample_rate))

    class _L:
        def __iter__(self):
            return iter(host_batches)

        def __len__(self):
            return len(host_batches)

    pending = []
    rng2 = jax.random.PRNGKey(2)
    t0 = time.perf_counter()
    for batch in Prefetcher(_L()):
        rng2, sub = jax.random.split(rng2)
        params, opt, state, out = run_step(
            params, opt, state,
            (batch.pcm, batch.n_frames, batch.targets, batch.tgt_lengths),
            sub)
        pending.append(out)
        if len(pending) > 2:
            jax.device_get(pending.pop(0))
    for out in pending:
        jax.device_get(out)
    emit("loop_real_prefetcher", 1000 * (time.perf_counter() - t0) / N)

    # ---- 5b. drain metrics ONLY (no hyp/gold argmax pull) ----
    th = threading.Thread(target=producer, args=(N,), daemon=True)
    pending = []
    t0 = time.perf_counter()
    th.start()
    while True:
        b = q.get()
        if b is None:
            break
        params, opt, state, out = run_step(params, opt, state, b, rng)
        pending.append(out[0])
        if len(pending) > 2:
            jax.device_get(pending.pop(0))
    for m in pending:
        jax.device_get(m)
    emit("loop_fresh_metrics_only", 1000 * (time.perf_counter() - t0) / N)


if __name__ == "__main__":
    main()
