"""Transformer encoder.

Reference: models/asr/transformer.py:126-203 (Encoder / EncoderLayer).
Structure per layer: post-LN self-attention → non-pad-mask multiply →
conv-FFN → non-pad-mask multiply. Input projection + LayerNorm + additive
sinusoidal positional encoding at the bottom (transformer.py:172-173).
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from end2end_asr_tpu.models import layers as L

Params = Dict[str, object]


def init_encoder(key, num_layers: int, num_heads: int, dim_model: int,
                 dim_key: int, dim_value: int, dim_input: int,
                 dim_inner: int, src_max_length: int = 2500,
                 rank: int = 0) -> Params:
    # keys[1] is intentionally unconsumed (the split count mirrors
    # init_decoder, whose keys[1] seeds output_linear); changing the
    # split count would shift every layer's init stream and break
    # seeded-run reproducibility against existing checkpoints
    keys = jax.random.split(key, 2 + num_layers)
    layers_p = []
    for i in range(num_layers):
        ka, kf = jax.random.split(keys[2 + i])
        layers_p.append({
            "self_attn": L.init_mha(ka, num_heads, dim_model, dim_key,
                                    dim_value, rank=rank),
            "ffn": L.init_ffn(kf, dim_model, dim_inner, rank=rank),
        })
    return {
        "input_linear": L.init_dense(keys[0], dim_input, dim_model),
        "ln_input": L.init_layer_norm(dim_model),
        "layers": layers_p,
        # static, non-trainable buffer (kept in params for checkpointing
        # symmetry with the reference's registered buffer)
        "pe": L.sinusoid_table(src_max_length, dim_model),
    }


def apply_encoder(p: Params, x: jnp.ndarray, input_lengths: jnp.ndarray,
                  num_heads: int, dim_key: int, dim_value: int,
                  dropout_rate: float = 0.1, deterministic: bool = True,
                  rng=None, dtype=jnp.bfloat16,
                  remat: bool = False, seq_par: bool = False,
                  pipe_par: bool = False) -> jnp.ndarray:
    """x: (B, T, dim_input) post-frontend features; input_lengths: (B,).

    Masks follow reference semantics exactly: lengths >= T mask nothing
    (the conv-frontend no-op quirk — see layers.non_pad_mask_from_lengths).

    seq_par: Megatron-SP over the time axis (parallel/sp.py) — the
    residual/LN/dropout segments run with T sharded on the 'model' mesh
    axis; mha/ffn gather at their matmul entries. Output is gathered
    back to full so downstream (decoder cross-attn, decode caches) is
    layout-unchanged.

    pipe_par: GPipe pipeline over the layer stack (parallel/pp.py) —
    layers shard into stages on the 'pipe' mesh axis, microbatches flow
    through via ppermute. Masks travel with each microbatch; dropout
    draws per-(layer, microbatch) streams via fold_in.
    """
    B, T, _ = x.shape
    non_pad = L.non_pad_mask_from_lengths(input_lengths, T)  # (B,T,1)
    self_attn_mask = L.attn_pad_mask_from_lengths(input_lengths, T, T)

    out = L.layer_norm(p["ln_input"], L.dense(p["input_linear"], x, dtype)
                       .astype(jnp.float32))
    # PE is a fixed buffer in the reference (common_layers.py:76-98,
    # registered non-trainable): stop_gradient so Adam never updates it.
    out = out + jax.lax.stop_gradient(p["pe"])[None, :T]

    if seq_par:
        from end2end_asr_tpu.parallel import sp
        sp.check_seq_divisible(T)
        out = sp.seq(out)

    def layer_fn(lp, out, non_pad, self_attn_mask, r1, r2):
        out = L.mha(lp["self_attn"], out, out, out,
                    num_heads, dim_key, dim_value, mask=self_attn_mask,
                    dropout_rate=dropout_rate, deterministic=deterministic,
                    rng=r1, dtype=dtype, seq_par=seq_par)
        out = out * non_pad
        out = L.ffn(lp["ffn"], out, dropout_rate=dropout_rate,
                    deterministic=deterministic, rng=r2, dtype=dtype,
                    seq_par=seq_par)
        return out * non_pad

    if pipe_par:
        from end2end_asr_tpu.parallel import pp
        if pp.active():
            # per-layer keys drawn with the SAME split sequence as the
            # sequential loop, stacked alongside the layer params so each
            # pipeline stage carries its own; fold_in(mb) decorrelates
            # microbatches
            keyed = rng is not None
            lp_list = []
            for lp in p["layers"]:
                if keyed:
                    rng, r1, r2 = jax.random.split(rng, 3)
                    lp = dict(lp, _r1=r1, _r2=r2)
                lp_list.append(lp)

            def lstep(lp_i, a, cs, mb_id):
                np_mb, mask_mb = cs
                r1 = (jax.random.fold_in(lp_i["_r1"], mb_id)
                      if keyed else None)
                r2 = (jax.random.fold_in(lp_i["_r2"], mb_id)
                      if keyed else None)
                return layer_fn(lp_i, a, np_mb, mask_mb, r1, r2)

            return pp.pipeline_apply(pp.stack_layers(lp_list), out,
                                     (non_pad, self_attn_mask), lstep,
                                     remat=remat)

    if remat:
        layer_fn = jax.checkpoint(layer_fn, static_argnums=())

    for lp in p["layers"]:
        if rng is not None:
            rng, r1, r2 = jax.random.split(rng, 3)
        else:
            r1 = r2 = None
        out = layer_fn(lp, out, non_pad, self_attn_mask, r1, r2)
    if seq_par:
        from end2end_asr_tpu.parallel import sp
        out = sp.full(out)
    return out
