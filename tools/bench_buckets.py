#!/usr/bin/env python3
"""Real-chip validation + timing of EVERY bucket-ladder rung (VERDICT r3
weak #3: only T=800 had ever run on the TPU; the vgg_fused/flash-attn
VMEM gates route 1600+ frame buckets to composite paths that had never
executed on hardware).

For each (src_bucket, tgt_bucket) rung of the flagship AiShell ladder,
runs the REAL jitted train step (fwd+bwd+Adam, on-device features,
donated buffers) for a few steps and reports ms/step and utt/s — or the
failure (OOM / compile error), per rung, without killing the sweep.
Matches the reference's src_max_len=4000 envelope
(/root/reference/utils/constant.py:61, utils/data_loader.py:131).

  python tools/bench_buckets.py                  # flagship, batch 12
  python tools/bench_buckets.py --grad-accum 4   # microbatched long rungs

Prints one JSON line per rung plus a duration-weighted summary.
"""

import argparse
import functools
import json
import sys
import time

sys.path.insert(0, ".")

import numpy as np

# duration-correlated (src, tgt) rungs of the default ladder
RUNGS = [(200, 50), (400, 50), (800, 100), (1600, 200), (2400, 400),
         (4000, 1000)]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch-size", type=int, default=12)
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--grad-accum", type=int, default=1)
    ap.add_argument("--platform", default=None)
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--rungs", type=str, default="",
                    help="comma list of src buckets to run (default all)")
    args = ap.parse_args()

    import os
    if args.platform:
        os.environ["JAX_PLATFORMS"] = args.platform
    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    jax.config.update("jax_default_prng_impl", "rbg")

    from __graft_entry__ import _flagship_cfg, _synthetic_batch
    from end2end_asr_tpu.models.transformer import (dims_from_config,
                                                    init_transformer)
    from end2end_asr_tpu.training.optimizer import init_adam_state
    from end2end_asr_tpu.training.steps import make_train_step

    cfg = _flagship_cfg(tiny=args.tiny).replace(grad_accum=args.grad_accum)
    num_vocab = 64 if args.tiny else 4336
    B = args.batch_size
    dims = dims_from_config(cfg)
    step = make_train_step(cfg, dims, from_pcm=True)

    want = ({int(x) for x in args.rungs.split(",") if x}
            if args.rungs else None)
    results = []
    for T, U in RUNGS:
        if want is not None and T not in want:
            continue
        # fresh model state per rung: donation invalidates buffers and
        # rung failures must not poison the next rung
        params, state = jax.jit(functools.partial(
            init_transformer, cfg=cfg, num_vocab=num_vocab))(
                jax.random.PRNGKey(0))
        opt = init_adam_state(params)
        rng = jax.random.PRNGKey(1)
        try:
            pcm, nf, tg, tl = _synthetic_batch(cfg, B, T, U, seed=T)
            dev = jax.device_put((pcm, nf, tg, tl))
            t_c0 = time.perf_counter()
            params, opt, state, m, _, _ = step(
                params, opt, state, rng, *dev, spect_T=T)
            loss0 = float(m["loss"])
            compile_s = time.perf_counter() - t_c0
            t0 = time.perf_counter()
            for _ in range(args.steps):
                params, opt, state, m, _, _ = step(
                    params, opt, state, rng, *dev, spect_T=T)
            loss = float(m["loss"])  # sync
            ms = 1000 * (time.perf_counter() - t0) / args.steps
            audio_s = B * T * cfg.hop_length / cfg.sample_rate
            rec = {"src_bucket": T, "tgt_bucket": U, "ms_per_step":
                   round(ms, 2), "utt_per_s": round(B / (ms / 1000), 1),
                   "audio_rtf_x": round(audio_s / (ms / 1000), 1),
                   "compile_s": round(compile_s, 1),
                   "loss_finite": bool(np.isfinite(loss) and
                                       np.isfinite(loss0)),
                   "grad_accum": args.grad_accum, "batch": B, "ok": True}
        except Exception as e:  # noqa: BLE001 — report the rung, continue
            rec = {"src_bucket": T, "tgt_bucket": U, "ok": False,
                   "grad_accum": args.grad_accum, "batch": B,
                   "error": f"{type(e).__name__}: {str(e)[:300]}"}
        results.append(rec)
        print(json.dumps(rec), flush=True)

    ok = [r for r in results if r["ok"]]
    if ok:
        # duration-weighted utt/s: weight each rung by its audio seconds
        # (AiShell utterances cluster near 800 frames, but an epoch
        # touches every rung the manifest fills)
        wsum = sum(r["src_bucket"] for r in ok)
        wutt = sum(r["utt_per_s"] * r["src_bucket"] for r in ok) / wsum
        print(json.dumps({"summary": "duration_weighted_utt_per_s",
                          "value": round(wutt, 1),
                          "rungs_ok": len(ok),
                          "rungs_failed": len(results) - len(ok)}),
              flush=True)


if __name__ == "__main__":
    main()
