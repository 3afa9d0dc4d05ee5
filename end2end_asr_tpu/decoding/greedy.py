"""Batched greedy decoding as a single compiled `lax.scan`.

Reference: Decoder.greedy_search (models/asr/transformer.py:316-394) runs a
Python loop of 300 steps and re-runs the ENTIRE decoder stack over the
growing prefix each step — O(n²·layers) full-prefix recompute on host-driven
control flow. Here each step is a KV-cached `decode_step` inside `lax.scan`:
one compiled program, O(n) per step, batch-parallel on the MXU. With
dropout off (eval) the cached step is numerically identical to full-prefix
recompute.

Inference-mode quirks reproduced: non-pad mask of ones and NO cross-attn
mask (transformer.py:336-348), argmax fed back even after EOS, host-side
string cut at the first EOS (transformer.py:385-394).
"""

from __future__ import annotations

import functools
from typing import Dict, List

import jax
import jax.numpy as jnp

from end2end_asr_tpu.config import EOS_TOKEN, SOS_TOKEN
from end2end_asr_tpu.models import decoder as D
from end2end_asr_tpu.models.transformer import ModelDims


_all_finished = jax.jit(
    lambda ids: jnp.all((ids == EOS_TOKEN).any(axis=1)))


@functools.partial(jax.jit, static_argnames=("dims", "max_len"))
def greedy_decode(params: Dict, enc_out: jnp.ndarray, dims: ModelDims,
                  max_len: int = 300) -> jnp.ndarray:
    """enc_out: (B, T_enc, H). Returns generated ids (B, max_len);
    positions after each utterance's first EOS are filled with EOS.

    A `lax.while_loop` exits as soon as every utterance has emitted EOS —
    the reference (and a plain scan) always pays all 300 steps
    (transformer.py:332); typical utterances finish in 20-50.
    """
    B = enc_out.shape[0]
    dec = params["decoder"]
    cache = D.init_cache(dec, enc_out, max_len, dims.num_heads,
                         dims.dim_key, dims.dim_value, dtype=dims.dtype)
    out = jnp.full((B, max_len), EOS_TOKEN, jnp.int32)
    done = jnp.zeros((B,), bool)
    token = jnp.full((B,), SOS_TOKEN, jnp.int32)

    def cond(state):
        t, token, done, out, cache = state
        return (t < max_len) & ~jnp.all(done)

    def body(state):
        t, token, done, out, cache = state
        logits, cache = D.decode_step(
            dec, cache, token, t, dims.num_heads, dims.dim_key,
            dims.dim_value, dims.dim_model,
            emb_trg_sharing=dims.emb_trg_sharing, dtype=dims.dtype)
        next_token = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        next_token = jnp.where(done, EOS_TOKEN, next_token)
        out = out.at[:, t].set(next_token)
        done = done | (next_token == EOS_TOKEN)
        return (t + 1, next_token, done, out, cache)

    _, _, _, out, _ = jax.lax.while_loop(
        cond, body, (jnp.int32(0), token, done, out, cache))
    return out


def greedy_decode_progressive(params: Dict, enc_out: jnp.ndarray,
                              dims: ModelDims, max_len: int = 300,
                              stage_len: int = 64) -> jnp.ndarray:
    """Exact two-stage greedy: decode with a short KV cache first and
    re-run at full length only if some utterance never emitted EOS.

    The cache length is numerically inert (attention is masked to
    positions <= t), so tokens before the first EOS are identical at any
    max_len — stage 1 is exact for every utterance that finishes within
    stage_len steps, which at the reference's typical 20-50 step outputs
    is nearly all of them. Per-step cost scales with cache length, so
    this cuts the common case ~(max_len/stage_len)x while the worst case
    pays one extra short pass. Returns (B, max_len) like greedy_decode.
    """
    if stage_len >= max_len:
        return greedy_decode(params, enc_out, dims, max_len=max_len)
    ids1 = greedy_decode(params, enc_out, dims, max_len=stage_len)
    # all-finished as a replicated device scalar: under multi-process
    # SPMD ids1 is batch-sharded and a host np.asarray of per-row flags
    # would touch non-addressable shards; the jitted all-reduce yields a
    # scalar every process can read, so every process takes the same
    # branch (and it's one dispatch instead of three eager ops).
    if bool(_all_finished(ids1)):
        pad = jnp.full((ids1.shape[0], max_len - stage_len), EOS_TOKEN,
                       jnp.int32)
        return jnp.concatenate([ids1, pad], axis=1)
    return greedy_decode(params, enc_out, dims, max_len=max_len)


def ids_to_strings(ids, id2label: Dict[int, str]) -> List[str]:
    """Host-side: chars until the first EOS (exclusive), like
    transformer.py:385-394. The learned leading SOS char stays in the
    string (callers strip specials, test.py:44)."""
    import numpy as np
    out = []
    for row in np.asarray(ids):
        s = ""
        for tok in row:
            if int(tok) == EOS_TOKEN:
                break
            s += id2label.get(int(tok), "")
        out.append(s)
    return out
