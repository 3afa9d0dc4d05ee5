"""Capture a jax.profiler trace of the flagship train step (real TPU)
and print a per-op-category duration breakdown from the trace JSON.

Python-loop dispatch (not scan) so per-op events appear individually.
Usage: python tools/trace_step.py [--iters 6] [--dir /tmp/trace_step]
"""

import argparse
import collections
import functools
import glob
import gzip
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=6)
    ap.add_argument("--dir", default="/tmp/trace_step")
    ap.add_argument("--batch", type=int, default=12)
    ap.add_argument("--frames", type=int, default=800)
    ap.add_argument("--tgt", type=int, default=48)
    ap.add_argument("--vocab", type=int, default=4336)
    ap.add_argument("--top", type=int, default=40)
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

    cfg = _flagship_cfg().replace(batch_size=args.batch)
    dims = dims_from_config(cfg)
    noam = noam_config_from(cfg)
    params, state = jax.jit(functools.partial(
        init_transformer, cfg=cfg, num_vocab=args.vocab))(
            jax.random.PRNGKey(0))
    opt = init_adam_state(params)
    pcm, nf, tg, tl = _synthetic_batch(cfg, args.batch, args.frames,
                                       args.tgt)
    tg = np.minimum(tg, args.vocab - 1).astype(np.int32)
    pcm, nf, tg, tl = map(jax.device_put, (pcm, nf, tg, tl))

    @jax.jit
    def step(params, opt, i):
        def loss_fn(p):
            spect = batched_features_pallas(
                pcm, nf, cfg.n_fft, cfg.hop_length, cfg.window,
                T_out=args.frames, normalize=True)
            pred, gold, _ = forward(
                p, state, spect, nf, tg, dims, train=True,
                rng=jax.random.fold_in(jax.random.PRNGKey(0), i))
            return calculate_loss(pred, gold, None, tl,
                                  cfg.label_smoothing, cfg.loss)
        loss, grads = jax.value_and_grad(loss_fn)(params)
        params, opt, _ = adam_noam_update(params, grads, opt, noam)
        return params, opt, loss

    # warm
    params, opt, loss = step(params, opt, 0)
    print("warm loss", float(loss))

    with jax.profiler.trace(args.dir):
        for i in range(1, args.iters + 1):
            params, opt, loss = step(params, opt, i)
        print("traced loss", float(loss))

    # ---- analyze ----
    paths = sorted(glob.glob(
        os.path.join(args.dir, "plugins/profile/*/*.trace.json.gz")),
        key=os.path.getmtime)
    assert paths, f"no trace under {args.dir}"
    with gzip.open(paths[-1], "rt") as f:
        tr = json.load(f)
    events = [e for e in tr["traceEvents"]
              if e.get("ph") == "X" and "dur" in e]
    # keep only TPU op-level events (pid named like /device:TPU or XLA Ops)
    pidname = {}
    for e in tr["traceEvents"]:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pidname[e["pid"]] = e["args"].get("name", "")
    tidname = {}
    for e in tr["traceEvents"]:
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            tidname[(e["pid"], e["tid"])] = e["args"].get("name", "")
    fam = collections.Counter()
    famn = collections.Counter()
    indiv = collections.Counter()
    total = 0.0
    nsteps = args.iters
    for e in events:
        tn = tidname.get((e["pid"], e["tid"]), "")
        if "XLA Op" not in tn and "XLA Ops" not in tn:
            continue
        name = e.get("name", "?")
        dur = e["dur"] / 1e3 / nsteps  # us -> ms, per step
        total += dur
        family = name.rstrip("0123456789").rstrip(".")
        fam[family] += dur
        famn[family] += 1
        indiv[name] += dur
    print(f"\nTPU op time: {total:.2f} ms/step over {nsteps} steps "
          f"(trace {os.path.basename(paths[-1])})")
    print("\n-- by family --")
    for name, ms in fam.most_common(args.top):
        print(f"{ms:8.3f} ms  x{famn[name] // nsteps:<4d} {name}")
    print("\n-- top individual ops --")
    for name, ms in indiv.most_common(args.top):
        print(f"{ms:8.3f} ms  {name}")


if __name__ == "__main__":
    main()
