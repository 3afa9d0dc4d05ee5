#!/usr/bin/env python3
"""Beam-step cost breakdown probe (diagnostic, not a benchmark).

Replicates beam_search_device's per-step work as a fixed-length lax.scan
with components toggled off one at a time, so each component's device
cost can be read from the differences (the production while_loop's
early-exit makes ablation timings incomparable otherwise).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/probe_beam.py
"""

import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _flagship_cfg, _synthetic_batch
    from end2end_asr_tpu.config import EOS_TOKEN, SOS_TOKEN
    from end2end_asr_tpu.models import decoder as D
    from end2end_asr_tpu.models.transformer import (dims_from_config,
                                                    init_transformer)
    from end2end_asr_tpu.training.steps import make_encode_fn

    BATCH, T_FRAMES, VOCAB, W = 12, 800, 4336, 8
    NEG = -1.0e30
    cfg = _flagship_cfg().replace(batch_size=BATCH, beam_width=W)
    dims = dims_from_config(cfg)
    params, state = jax.jit(functools.partial(
        init_transformer, cfg=cfg, num_vocab=VOCAB))(jax.random.PRNGKey(0))
    pcm, n_frames, _, _ = _synthetic_batch(cfg, BATCH, T_FRAMES, 8)
    encode_fn = make_encode_fn(cfg, dims, from_pcm=True)
    enc_out, _ = encode_fn(params, state, pcm, n_frames, spect_T=T_FRAMES)
    B, T_enc = enc_out.shape[0], enc_out.shape[1]
    n_steps = min(300, T_enc)
    L = n_steps + 2
    P = 4 * W

    @functools.partial(jax.jit, static_argnames=(
        "attend", "topk", "pool", "decode"))
    def run(params, enc_out, attend=True, topk=True, pool=True,
            decode=True):
        dec = params["decoder"]
        if attend:
            cache = D.init_cache(dec, enc_out, L, dims.num_heads,
                                 dims.dim_key, dims.dim_value,
                                 dtype=dims.dtype, beam_W=W)
        else:  # plain per-row cache (no ancestry attend, wrong results)
            cache = D.init_cache(dec, jnp.repeat(enc_out, W, axis=0), L,
                                 dims.num_heads, dims.dim_key,
                                 dims.dim_value, dtype=dims.dtype)
        tokens = jnp.full((B, W, L), EOS_TOKEN, jnp.int32)
        tokens = tokens.at[:, :, 0].set(SOS_TOKEN)
        scores = jnp.full((B, W), NEG, jnp.float32).at[:, 0].set(0.0)
        anc = jnp.zeros((B, W, L), jnp.int32)
        if pool == "defer":
            # deferred pool: dus-written retire records, no top_k/gather
            pool_t = jnp.full((B, n_steps, W), NEG, jnp.float32)  # ret_s
            pool_s = jnp.zeros((B, n_steps, W), jnp.int32)  # parents
            pool_l = jnp.zeros((B, W, L), jnp.int32)  # tok_hist
        else:
            pool_t = jnp.full((B, P, L), EOS_TOKEN, jnp.int32)
            pool_s = jnp.full((B, P), NEG, jnp.float32)
            pool_l = jnp.zeros((B, P), jnp.int32)

        def step(carry, t):
            tokens, scores, anc, cache, pool_t, pool_s, pool_l = carry
            last = tokens[:, :, t].reshape(B * W)
            anc2 = anc.at[:, :, t].set(jnp.arange(W)[None, :])
            anc_hot = (anc2[:, :, None, :] == jnp.arange(W)[
                None, None, :, None]).astype(jnp.float32)
            if decode:
                logits, cache2 = D.decode_step(
                    dec, cache, last, t, dims.num_heads, dims.dim_key,
                    dims.dim_value, dims.dim_model,
                    emb_trg_sharing=dims.emb_trg_sharing,
                    dtype=dims.dtype,
                    beam=(W, anc_hot) if attend else None)
            else:
                logits = jnp.zeros((B * W, VOCAB), jnp.float32)
                logits = logits + anc_hot.sum() * 0  # keep anc live
                cache2 = cache
            logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
            logp = logp.reshape(B, W, VOCAB)
            cand = scores[:, :, None] + logp
            if topk:
                top_s, top_i = jax.lax.top_k(cand.reshape(B, W * VOCAB), W)
                parent = top_i // VOCAB
                tok = (top_i % VOCAB).astype(jnp.int32)
            else:
                top_s = cand[:, :, 3]
                parent = jnp.tile(jnp.arange(W)[None], (B, 1))
                tok = jnp.full((B, W), 3, jnp.int32)
            take_rows = jax.vmap(lambda x, i: x[i])
            new_tokens = take_rows(tokens, parent)
            new_tokens = new_tokens.at[:, :, t + 1].set(tok)
            new_anc = take_rows(anc2, parent)
            if pool == "defer":
                end_s = jnp.where(tok == EOS_TOKEN, top_s, NEG)
                pool_t = jax.lax.dynamic_update_index_in_dim(
                    pool_t, end_s, t, 1)
                pool_s = jax.lax.dynamic_update_index_in_dim(
                    pool_s, parent, t, 1)
                pool_l = jax.lax.dynamic_update_index_in_dim(
                    pool_l, tok, t + 1, 2)
                return (new_tokens, top_s, new_anc, cache2, pool_t,
                        pool_s, pool_l), None
            if pool:
                end_s = jnp.where(tok == EOS_TOKEN, top_s, NEG)
                end_l = jnp.full((B, W), t + 2, jnp.int32)
                all_t = jnp.concatenate([pool_t, new_tokens], axis=1)
                all_s = jnp.concatenate([pool_s, end_s], axis=1)
                all_l = jnp.concatenate([pool_l, end_l], axis=1)
                if pool == "static":  # cost of top_k(P) alone
                    top_ps = all_s[:, :P]
                    top_pi = jnp.tile(jnp.arange(P)[None], (B, 1))
                elif pool == "rank":
                    # sort-free exact top-P: rank by pairwise comparison
                    gt = (all_s[:, :, None] > all_s[:, None, :])
                    eq = (all_s[:, :, None] == all_s[:, None, :])
                    idx_lt = (jnp.arange(P + W)[:, None]
                              > jnp.arange(P + W)[None, :])
                    rank = (gt | (eq & idx_lt)).sum(1)  # rank of each q
                    sel = jax.nn.one_hot(
                        jnp.where(rank < P, rank, P), P + 1,
                        dtype=jnp.float32)[..., :P]  # (B, P+W, P)
                    pool_s = jnp.einsum("bqp,bq->bp", sel, all_s)
                    pool_t = jnp.einsum(
                        "bqp,bql->bpl", sel,
                        all_t.astype(jnp.float32)).astype(jnp.int32)
                    pool_l = jnp.einsum(
                        "bqp,bq->bp", sel,
                        all_l.astype(jnp.float32)).astype(jnp.int32)
                    return (new_tokens, top_s, new_anc, cache2, pool_t,
                            pool_s, pool_l), None
                else:
                    top_ps, top_pi = jax.lax.top_k(all_s, P)
                if pool == "onehot":
                    sel = jax.nn.one_hot(top_pi, P + W, dtype=jnp.float32)
                    pool_t = jnp.einsum(
                        "bpq,bql->bpl", sel,
                        all_t.astype(jnp.float32)).astype(jnp.int32)
                    pool_l = jnp.einsum(
                        "bpq,bq->bp", sel,
                        all_l.astype(jnp.float32)).astype(jnp.int32)
                    pool_s = top_ps
                else:
                    take = jax.vmap(lambda x, i: x[i])
                    pool_t, pool_s, pool_l = (take(all_t, top_pi), top_ps,
                                              take(all_l, top_pi))
            return (new_tokens, top_s, new_anc, cache2, pool_t, pool_s,
                    pool_l), None

        carry = (tokens, scores, anc, cache, pool_t, pool_s, pool_l)
        carry, _ = jax.lax.scan(step, carry, jnp.arange(n_steps))
        # reduce over EVERY carry leaf: returning only pool_s lets XLA
        # dead-code-eliminate the rest of the loop in some ablations
        return sum(jnp.sum(x.astype(jnp.float32))
                   for x in jax.tree_util.tree_leaves(carry))

    def timeit(**kw):
        out = run(params, enc_out, **kw)
        _ = np.asarray(out)
        t0 = time.time()
        N = 5
        for _ in range(N):
            out = run(params, enc_out, **kw)
            _ = np.asarray(out)
        return (time.time() - t0) / N * 1000

    print(f"n_steps={n_steps}")
    for label, kw in [
        ("full(gather-pool)", {}),
        ("onehot-pool", {"pool": "onehot"}),
        ("rank-pool (no 2nd top_k)", {"pool": "rank"}),
        ("defer-pool (dus records only)", {"pool": "defer"}),
        ("static-pool (no topk(P), no select)", {"pool": "static"}),
        ("no pool", {"pool": False}),
        ("no topk(WV)", {"topk": False}),
        ("plain attend", {"attend": False}),
        ("no decode", {"decode": False}),
    ]:
        dt = timeit(**kw)
        print(f"{label:38s}{dt:8.1f} ms  ({dt / n_steps:.3f} ms/step)")


if __name__ == "__main__":
    main()
