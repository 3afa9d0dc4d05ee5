#!/usr/bin/env python3
"""Device-true step timing via an in-program lax.scan.

Through this image's remote-TPU tunnel, per-dispatch overhead (~1 ms +
host-numpy re-uploads) and a non-blocking block_until_ready make naive
Python-loop timing wrong by up to 5×. Running R iterations inside ONE
jitted scan and host-reading the final loss measures pure device time.

Usage:
  python tools/profile_step.py [--batch 12] [--frames 800] [--iters 10]
                               [--stage step|forward|features]
"""

import argparse
import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=12)
    ap.add_argument("--frames", type=int, default=800)
    ap.add_argument("--tgt", type=int, default=48)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--vocab", type=int, default=4336)
    ap.add_argument("--stage", default="step",
                    choices=["step", "forward", "features"])
    ap.add_argument("--adam-moments", default="float32",
                    choices=["float32", "bfloat16"])
    ap.add_argument("--dropout", type=float, default=None,
                    help="override cfg.dropout (ablation probes)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _flagship_cfg, _synthetic_batch
    from end2end_asr_tpu.models.transformer import (dims_from_config,
                                                    forward,
                                                    init_transformer)
    from end2end_asr_tpu.ops.stft_pallas import batched_features_pallas
    from end2end_asr_tpu.training.loss import calculate_loss
    from end2end_asr_tpu.training.optimizer import (adam_noam_update,
                                                    init_adam_state)
    from end2end_asr_tpu.training.steps import noam_config_from

    cfg = _flagship_cfg().replace(batch_size=args.batch,
                                  adam_moments_dtype=args.adam_moments)
    if args.dropout is not None:
        cfg = cfg.replace(dropout=args.dropout)
    dims = dims_from_config(cfg)
    noam = noam_config_from(cfg)
    params, state = jax.jit(functools.partial(
        init_transformer, cfg=cfg, num_vocab=args.vocab))(
            jax.random.PRNGKey(0))
    opt = init_adam_state(
        params, moments_dtype=jnp.bfloat16
        if args.adam_moments == "bfloat16" else None)
    pcm, nf, tg, tl = _synthetic_batch(cfg, args.batch, args.frames,
                                       args.tgt)
    tg = np.minimum(tg, args.vocab - 1).astype(np.int32)
    pcm, nf, tg, tl = map(jax.device_put, (pcm, nf, tg, tl))
    R = args.iters

    def features(i):
        return batched_features_pallas(pcm, nf, cfg.n_fft, cfg.hop_length,
                                       cfg.window, T_out=args.frames,
                                       normalize=True)

    def fwd(p, i):
        spect = features(i)
        pred, gold, _ = forward(p, state, spect, nf, tg, dims, train=False)
        return jnp.mean(pred)

    if args.stage == "features":
        @jax.jit
        def loop(_):
            def body(acc, i):
                return acc + jnp.sum(features(i)) * 1e-9, None
            return jax.lax.scan(body, jnp.float32(0), jnp.arange(R))[0]
        t0 = time.time()
        float(loop(0))
        print(f"compile+first: {time.time() - t0:.1f}s")
        t0 = time.time()
        float(loop(0))
    elif args.stage == "forward":
        @jax.jit
        def loop(p):
            def body(acc, i):
                return acc + fwd(p, i) * 1e-9, None
            return jax.lax.scan(body, jnp.float32(0), jnp.arange(R))[0]
        t0 = time.time()
        float(loop(params))
        print(f"compile+first: {time.time() - t0:.1f}s")
        t0 = time.time()
        float(loop(params))
    else:
        @jax.jit
        def loop(params, opt):
            def body(carry, i):
                params, opt = carry
                def loss_fn(p):
                    spect = features(i)
                    pred, gold, _ = forward(
                        p, state, spect, nf, tg, dims, train=True,
                        rng=jax.random.fold_in(jax.random.PRNGKey(0), i))
                    return calculate_loss(pred, gold, None, tl,
                                          cfg.label_smoothing, cfg.loss)
                loss, grads = jax.value_and_grad(loss_fn)(params)
                params, opt, _ = adam_noam_update(params, grads, opt, noam)
                return (params, opt), loss
            (_, _), losses = jax.lax.scan(body, (params, opt),
                                          jnp.arange(R))
            return losses[-1]
        t0 = time.time()
        float(loop(params, opt))
        print(f"compile+first: {time.time() - t0:.1f}s")
        t0 = time.time()
        float(loop(params, opt))

    dt = (time.time() - t0) / R
    print(f"{args.stage}: {dt * 1000:.2f} ms/iter "
          f"({args.batch / dt:.1f} utt/s)")


if __name__ == "__main__":
    main()
