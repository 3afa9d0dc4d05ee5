#!/usr/bin/env python3
"""Isolate the optimizer pass (VERDICT r3 #9): the round-4 trace shows
~2.9 ms of the 16.1 ms step in ~183 per-leaf divide_subtract fusions
(Adam) — per-kernel launch overhead on ~135 small leaves plus HBM
traffic. Variants, each timed as an in-program lax.scan on the chip:

  per_leaf   current adam_update (one multi-output fusion per leaf)
  flat_ideal p/g/m/v pre-flattened into single vectors (pure elementwise
             — the floor, ignoring the cost of getting flat and back)
  concat     leaves → one flat vector per step, update, split back
             (what a drop-in flat optimizer would actually pay)

All variants compute the SAME values (concat/split reorder no math).
"""

import argparse
import functools
import json
import sys
import time

sys.path.insert(0, ".")

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--platform", default=None)
    ap.add_argument("--tiny", action="store_true")
    args = ap.parse_args()

    import os
    if args.platform:
        os.environ["JAX_PLATFORMS"] = args.platform
    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp

    from __graft_entry__ import _flagship_cfg
    from end2end_asr_tpu.models.transformer import init_transformer
    from end2end_asr_tpu.training.optimizer import (NoamConfig,
                                                    adam_noam_update,
                                                    init_adam_state,
                                                    noam_rate)

    cfg = _flagship_cfg(tiny=args.tiny)
    num_vocab = 64 if args.tiny else 4336
    params, _ = jax.jit(functools.partial(
        init_transformer, cfg=cfg, num_vocab=num_vocab))(
            jax.random.PRNGKey(0))
    noam = NoamConfig(model_size=cfg.conv_dim_input(), factor=1.0,
                      warmup=4000, min_lr=1e-6)
    leaves = jax.tree_util.tree_leaves(params)
    nparam = sum(int(np.prod(l.shape)) for l in leaves)
    print(json.dumps({"leaves": len(leaves), "params_m":
                      round(nparam / 1e6, 2)}), flush=True)
    grads = jax.tree_util.tree_map(
        lambda p: (p * 1e-3 + 1e-5).astype(jnp.float32), params)
    R = args.iters

    def timed(name, fn, *args_):
        jfn = jax.jit(fn)
        out = jfn(*args_)
        jax.tree_util.tree_map(
            lambda x: np.asarray(x) if hasattr(x, "shape") and
            x.shape == () else None, out)
        float(jax.tree_util.tree_leaves(out)[0].ravel()[0])
        t0 = time.perf_counter()
        out = jfn(*args_)
        float(jax.tree_util.tree_leaves(out)[0].ravel()[0])
        ms = (time.perf_counter() - t0) * 1000 / R
        print(json.dumps({"variant": name, "ms_per_update":
                          round(ms, 3)}), flush=True)

    # ---- per_leaf (current) ----
    def run_per_leaf(params, grads):
        state = init_adam_state(params)

        def body(carry, _):
            p, s = carry
            p, s, _lr = adam_noam_update(p, grads, s, noam)
            return (p, s), ()

        (p, s), _ = jax.lax.scan(body, (params, state), None, length=R)
        return sum(jnp.sum(l) for l in jax.tree_util.tree_leaves(p))

    timed("per_leaf", run_per_leaf, params, grads)

    # ---- flat_ideal ----
    pf = jnp.concatenate([l.ravel() for l in leaves])
    gf = jnp.concatenate([g.ravel() for g in
                          jax.tree_util.tree_leaves(grads)])

    def flat_update(p, g, m, v, t):
        tf = t.astype(jnp.float32)
        bc1 = 1.0 - noam.beta1 ** tf
        bc2 = 1.0 - noam.beta2 ** tf
        lr = noam_rate(t, noam)
        m = noam.beta1 * m + (1.0 - noam.beta1) * g
        v = noam.beta2 * v + (1.0 - noam.beta2) * jnp.square(g)
        p = p - lr * (m / bc1) / (jnp.sqrt(v / bc2) + noam.eps)
        return p, m, v

    def run_flat(pf, gf):
        m = jnp.zeros_like(pf)
        v = jnp.zeros_like(pf)

        def body(carry, _):
            p, m, v, t = carry
            p, m, v = flat_update(p, gf, m, v, t + 1)
            return (p, m, v, t + 1), ()

        (p, m, v, _), _ = jax.lax.scan(
            body, (pf, m, v, jnp.int32(0)), None, length=R)
        return jnp.sum(p)

    timed("flat_ideal", run_flat, pf, gf)

    # ---- flat with torch-style scalar hoisting (1 divide + 1 sqrt per
    # element instead of 3 divides + 1 sqrt; torch itself computes
    # step_size = lr/bc1 and sqrt(bc2) as scalars) ----
    def flat_update_hoisted(p, g, m, v, t):
        tf = t.astype(jnp.float32)
        bc1 = 1.0 - noam.beta1 ** tf
        bc2 = 1.0 - noam.beta2 ** tf
        step_size = noam_rate(t, noam) / bc1
        inv_sqrt_bc2 = jax.lax.rsqrt(bc2)
        m = noam.beta1 * m + (1.0 - noam.beta1) * g
        v = noam.beta2 * v + (1.0 - noam.beta2) * jnp.square(g)
        denom = jnp.sqrt(v) * inv_sqrt_bc2 + noam.eps
        p = p - step_size * (m / denom)
        return p, m, v

    def run_flat_hoisted(pf, gf):
        m = jnp.zeros_like(pf)
        v = jnp.zeros_like(pf)

        def body(carry, _):
            p, m, v, t = carry
            p, m, v = flat_update_hoisted(p, gf, m, v, t + 1)
            return (p, m, v, t + 1), ()

        (p, m, v, _), _ = jax.lax.scan(
            body, (pf, m, v, jnp.int32(0)), None, length=R)
        return jnp.sum(p)

    timed("flat_hoisted", run_flat_hoisted, pf, gf)

    # ---- per-leaf with the same hoisting ----
    def run_per_leaf_hoisted(params, grads):
        m0 = jax.tree_util.tree_map(jnp.zeros_like, params)
        v0 = jax.tree_util.tree_map(jnp.zeros_like, params)

        def body(carry, _):
            p, m, v, t = carry
            out = jax.tree_util.tree_map(
                lambda pl, gl, ml, vl: flat_update_hoisted(
                    pl, gl, ml, vl, t + 1), p, grads, m, v)
            p = jax.tree_util.tree_map(lambda o: o[0], out,
                                       is_leaf=lambda x: isinstance(
                                           x, tuple))
            m = jax.tree_util.tree_map(lambda o: o[1], out,
                                       is_leaf=lambda x: isinstance(
                                           x, tuple))
            v = jax.tree_util.tree_map(lambda o: o[2], out,
                                       is_leaf=lambda x: isinstance(
                                           x, tuple))
            return (p, m, v, t + 1), ()

        (p, m, v, _), _ = jax.lax.scan(
            body, (params, m0, v0, jnp.int32(0)), None, length=R)
        return sum(jnp.sum(l) for l in jax.tree_util.tree_leaves(p))

    timed("per_leaf_hoisted", run_per_leaf_hoisted, params, grads)

    # ---- per-leaf with bf16 moment storage (--adam-moments-dtype):
    # 28 → 20 bytes/param of HBM traffic ----
    def run_per_leaf_bf16(params, grads):
        state = init_adam_state(params, moments_dtype=jnp.bfloat16)

        def body(carry, _):
            p, s = carry
            p, s, _lr = adam_noam_update(p, grads, s, noam)
            return (p, s), ()

        (p, s), _ = jax.lax.scan(body, (params, state), None, length=R)
        return sum(jnp.sum(l) for l in jax.tree_util.tree_leaves(p))

    timed("per_leaf_bf16_moments", run_per_leaf_bf16, params, grads)

    # ---- concat per step ----
    shapes = [l.shape for l in leaves]
    sizes = [int(np.prod(s)) for s in shapes]
    offs = np.cumsum([0] + sizes)
    treedef = jax.tree_util.tree_structure(params)

    def run_concat(params, grads):
        m = jnp.zeros(nparam, jnp.float32)
        v = jnp.zeros(nparam, jnp.float32)

        def body(carry, _):
            lv, m, v, t = carry
            p = jnp.concatenate([l.ravel() for l in lv])
            g = jnp.concatenate([x.ravel() for x in
                                 jax.tree_util.tree_leaves(grads)])
            p, m, v = flat_update(p, g, m, v, t + 1)
            lv = [p[offs[i]:offs[i + 1]].reshape(shapes[i])
                  for i in range(len(shapes))]
            return (lv, m, v, t + 1), ()

        (lv, m, v, _), _ = jax.lax.scan(
            body, (leaves, m, v, jnp.int32(0)), None, length=R)
        return sum(jnp.sum(l) for l in lv)

    timed("concat_per_step", run_concat, params, grads)


if __name__ == "__main__":
    main()
