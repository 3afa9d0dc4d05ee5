#!/usr/bin/env python3
"""A/B TPU compiler DebugOptions via lowered.compile(compiler_options=...).

tools/sweep_xla_flags.py tried the same knobs through XLA_FLAGS and
every arm died CLIENT-side: this image's CPU-built XLA flag parser
aborts on unknown --xla_tpu_* names before anything reaches the remote
TPU compiler. compiler_options= skips env parsing entirely — the dict
goes into the ExecutableBuildOptions that ride the compile RPC, so the
remote TPU compiler (which does know its own flags) sees them.

Same process, same traced program, interleaved A/B/A/B executions of
separately-compiled executables, so tunnel drift cancels. One JSON line
per arm + summary (schema matches sweep_xla_flags.py).

Usage:  PYTHONPATH=/root/repo:/root/.axon_site \
          python tools/probe_compiler_options.py [--steps 30]
"""

import argparse
import functools
import json
import time

import numpy as np

from end2end_asr_tpu.utils.platform import honor_env_platform

honor_env_platform()

import jax  # noqa: E402

ARMS = [
    ("scoped_vmem_48m", {"xla_tpu_scoped_vmem_limit_kib": "49152"}),
    ("scoped_vmem_64m", {"xla_tpu_scoped_vmem_limit_kib": "65536"}),
    ("scoped_vmem_96m", {"xla_tpu_scoped_vmem_limit_kib": "98304"}),
    ("latency_hiding",
     {"xla_tpu_enable_latency_hiding_scheduler": "true"}),
    ("no_multi_level_fusion",
     {"xla_tpu_enable_multi_level_nested_loop_fusion": "false"}),
    ("all_gather_latency",
     {"xla_tpu_enable_all_gather_offload_tracing": "true"}),
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--warmup", type=int, default=8)
    ap.add_argument("--reps", type=int, default=2,
                    help="ABAB repetitions per arm")
    ap.add_argument("--arms", type=str, default="",
                    help="comma-separated arm names (default: all)")
    args = ap.parse_args()

    import sys
    sys.path.insert(0, ".")
    from __graft_entry__ import _flagship_cfg, _synthetic_batch
    from end2end_asr_tpu.models.transformer import (dims_from_config,
                                                    init_transformer)
    from end2end_asr_tpu.training.optimizer import init_adam_state
    from end2end_asr_tpu.training.steps import make_train_step

    T, U, V, B = 800, 48, 4336, 12
    cfg = _flagship_cfg().replace(batch_size=B)
    dims = dims_from_config(cfg)
    params, state = jax.jit(functools.partial(
        init_transformer, cfg=cfg, num_vocab=V))(jax.random.PRNGKey(0))
    opt = init_adam_state(params)
    step = make_train_step(cfg, dims, from_pcm=True)
    batch = tuple(map(jax.device_put,
                      _synthetic_batch(cfg, B, T, U, num_vocab=V)))
    rng = jax.random.PRNGKey(1)

    # donation means each executable needs its OWN live buffers — keep a
    # host copy and re-put per timing block
    host_params = jax.device_get(params)
    host_opt = jax.device_get(opt)
    host_state = jax.device_get(state)

    lowered = step.lower(params, opt, state, rng, *batch, spect_T=T)

    def compile_arm(opts):
        try:
            return lowered.compile(compiler_options=opts or None), None
        except Exception as e:
            return None, f"{type(e).__name__}: {e}"[:300]

    def time_exec(compiled):
        p = jax.device_put(host_params)
        o = jax.device_put(host_opt)
        s = jax.device_put(host_state)
        r = jax.random.PRNGKey(1)
        for i in range(args.warmup):
            r, sub = jax.random.split(r)
            p, o, s, m, _, _ = compiled(p, o, s, sub, *batch)
        float(m["loss"])
        t0 = time.time()
        for i in range(args.steps):
            r, sub = jax.random.split(r)
            p, o, s, m, _, _ = compiled(p, o, s, sub, *batch)
        float(m["loss"])
        return (time.time() - t0) / args.steps * 1000

    base_exec, err = compile_arm(None)
    assert base_exec is not None, err

    want = {a.strip() for a in args.arms.split(",") if a.strip()}
    results = []
    for name, opts in ARMS:
        if want and name not in want:
            continue
        arm_exec, err = compile_arm(opts)
        if arm_exec is None:
            print(json.dumps({"arm": name, "flags": opts, "ok": False,
                              "error": err}), flush=True)
            continue
        pairs = []
        for _ in range(args.reps):
            b = time_exec(base_exec)
            a = time_exec(arm_exec)
            pairs.append((round(b, 2), round(a, 2)))
        delta = sum(a - b for b, a in pairs) / len(pairs)
        rec = {"arm": name, "flags": opts, "pairs": pairs,
               "delta_ms": round(delta, 2),
               "delta_pct": round(
                   100 * delta / (sum(b for b, _ in pairs) / len(pairs)),
                   1)}
        print(json.dumps(rec), flush=True)
        results.append(rec)
        del arm_exec
    best = min(results, key=lambda r: r["delta_ms"], default=None)
    print(json.dumps({"summary": True,
                      "best_arm": best["arm"] if best else None,
                      "best_delta_ms": (best or {}).get("delta_ms")}))


if __name__ == "__main__":
    main()
