"""Transformer building blocks, pure-functional JAX.

Behavioral contract with the reference (`models/common_layers.py`):
  * masks — get_non_pad_mask/get_attn_*_mask/get_subsequent_mask
    (common_layers.py:28-74),
  * sinusoidal positional encoding (common_layers.py:76-98),
  * multi-head attention with separate Q/K/V projection widths
    (num_heads*dim_key / num_heads*dim_value) and post-LN residual
    (common_layers.py:144-225),
  * position-wise FFN with kernel-1 Conv1d (common_layers.py:124-142) —
    a kernel-1 conv over time is exactly a dense layer over the feature
    axis, so here it is two MXU matmuls (identical math, better layout).

Initialization matches the *effective* reference init: the Transformer
container re-initializes every parameter with dim > 1 via xavier-uniform
after construction (models/asr/transformer.py:55-57), overriding the
per-layer normal/xavier-normal inits; biases keep torch's default
U(-1/sqrt(fan_in), 1/sqrt(fan_in)); LayerNorm is (1, 0).

Params are plain nested dicts of jnp arrays (pytrees) — shardable with
jax.sharding and trivially checkpointable.
"""

from __future__ import annotations

import math
import os
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

Params = Dict[str, object]

LN_EPS = 1e-5  # torch nn.LayerNorm default


# ---------------------------------------------------------------------------
# Initializers (torch-compatible)
# ---------------------------------------------------------------------------

def xavier_uniform(key, shape, fan_in: int, fan_out: int, dtype=jnp.float32):
    """torch.nn.init.xavier_uniform_ with gain 1."""
    a = math.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(key, shape, dtype, minval=-a, maxval=a)


def torch_bias_uniform(key, shape, fan_in: int, dtype=jnp.float32):
    """torch Linear/Conv default bias init: U(-1/sqrt(fan_in), 1/sqrt(fan_in))."""
    bound = 1.0 / math.sqrt(fan_in) if fan_in > 0 else 0.0
    return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)


def init_dense(key, d_in: int, d_out: int, bias: bool = True,
               rank: int = 0) -> Params:
    """Dense params; rank > 0 builds a low-rank factorization W = U·V
    (Low-Rank Transformer, Winata et al. ICASSP 2020 — the LRT variant in
    BASELINE.json). `dense` dispatches on the param structure, so every
    consumer (encoder/decoder/beam/greedy) runs either form unchanged."""
    kw, kb = jax.random.split(key)
    if rank and rank > 0 and rank < min(d_in, d_out):
        ku, kv = jax.random.split(kw)
        p = {"u": xavier_uniform(ku, (d_in, rank), d_in, rank),
             "v": xavier_uniform(kv, (rank, d_out), rank, d_out)}
    else:
        p = {"w": xavier_uniform(kw, (d_in, d_out), d_in, d_out)}
    if bias:
        p["b"] = torch_bias_uniform(kb, (d_out,), d_in)
    return p


def dense(p: Params, x: jnp.ndarray, dtype=None) -> jnp.ndarray:
    if dtype is not None:
        x = x.astype(dtype)
    if "u" in p:  # low-rank: two skinny MXU matmuls
        u, v = p["u"], p["v"]
        if dtype is not None:
            u, v = u.astype(dtype), v.astype(dtype)
        y = (x @ u) @ v
    elif "q8" in p:
        # int8 weight-only PTQ (models/quantize.py): weights live in HBM
        # as int8 + per-output-channel f32 scale (4× less weight traffic
        # than f32 — the bound of the latency-dominated decode step).
        # int8 values are exact in bf16, so the matmul itself matches
        # the normal path's bf16-cast weights; the scale multiply runs
        # in f32.
        w = p["q8"].astype(dtype if dtype is not None else x.dtype)
        y = ((x @ w).astype(jnp.float32) * p["scale"]).astype(w.dtype)
    else:
        w = p["w"] if dtype is None else p["w"].astype(dtype)
        y = x @ w
    if "b" in p:
        y = y + p["b"].astype(y.dtype)
    return y


def init_layer_norm(dim: int) -> Params:
    return {"scale": jnp.ones((dim,)), "bias": jnp.zeros((dim,))}


def layer_norm(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
    y = (x32 - mean) * jax.lax.rsqrt(var + LN_EPS)
    return (y * p["scale"] + p["bias"]).astype(x.dtype)


def dropout_thresh16(rate: float) -> int:
    """uint16 keep threshold: round((1-rate)·2^16). The single source of
    truth — the fused attention kernel (ops/attention_fused.py) compares
    its random bits against the SAME value so the XLA and kernel dropout
    paths keep bit-identical fractions."""
    return int(round((1.0 - rate) * 65536.0))


def dropout(key, x: jnp.ndarray, rate: float, deterministic: bool) -> jnp.ndarray:
    """Inverted dropout with a uint16 integer-compare mask.

    `bernoulli` draws 32 random bits per element and converts them to a
    float32 uniform before comparing; a keep-mask only needs enough bits
    to resolve the rate. Drawing uint16 bits and comparing against
    round(keep * 2^16) halves the RNG material and skips the int->float
    convert entirely. The effective keep probability is thresh/2^16
    (within 2^-16 of `1 - rate`) and the inverse scale uses that exact
    value, so the estimator stays unbiased.
    """
    if deterministic or rate <= 0.0:
        return x
    thresh = dropout_thresh16(rate)
    if thresh >= 65536:
        return x
    if thresh <= 0:
        # rate ≈ 1: keep probability rounds to zero — drop everything
        # (torch dropout(p=1) semantics) instead of dividing by zero
        return jnp.zeros_like(x)
    bits = jax.random.bits(key, x.shape, jnp.uint16)
    scale = jnp.asarray(65536.0 / thresh, x.dtype)
    return jnp.where(bits < thresh, x * scale, jnp.zeros_like(x))


# ---------------------------------------------------------------------------
# Masks (reference: models/common_layers.py:28-74)
# ---------------------------------------------------------------------------

def non_pad_mask_from_lengths(lengths: jnp.ndarray, T: int) -> jnp.ndarray:
    """(B, T, 1) float mask, 1.0 where t < length.

    Matches get_non_pad_mask(input_lengths=...) including the reference's
    clamp-free semantics: lengths larger than T mask nothing
    (common_layers.py:37-38) — which is what makes the post-conv encoder
    masks a no-op in the reference when raw frame lengths are passed.
    """
    t = jnp.arange(T)[None, :]
    return (t < lengths[:, None]).astype(jnp.float32)[:, :, None]


def non_pad_mask_from_pad(seq: jnp.ndarray, pad_idx: int) -> jnp.ndarray:
    """(B, T, 1) float mask, 1.0 where token != pad_idx
    (common_layers.py:39-42)."""
    return (seq != pad_idx).astype(jnp.float32)[:, :, None]


def attn_key_pad_mask(seq_k: jnp.ndarray, pad_idx: int, len_q: int) -> jnp.ndarray:
    """(B, T_q, T_k) bool, True = masked (common_layers.py:46-55)."""
    pad = seq_k == pad_idx  # B x T_k
    return jnp.broadcast_to(pad[:, None, :], (seq_k.shape[0], len_q, seq_k.shape[1]))


def attn_pad_mask_from_lengths(lengths: jnp.ndarray, T_k: int, len_q: int) -> jnp.ndarray:
    """(B, T_q, T_k) bool, True = masked key positions >= length
    (common_layers.py:57-64)."""
    t = jnp.arange(T_k)[None, :]
    pad = t >= lengths[:, None]  # B x T_k
    return jnp.broadcast_to(pad[:, None, :], (lengths.shape[0], len_q, T_k))


def subsequent_mask(B: int, T: int) -> jnp.ndarray:
    """(B, T, T) bool causal mask, True = masked (common_layers.py:66-74)."""
    m = jnp.triu(jnp.ones((T, T), dtype=bool), k=1)
    return jnp.broadcast_to(m[None], (B, T, T))


# ---------------------------------------------------------------------------
# Sinusoidal positional encoding (common_layers.py:76-98)
# ---------------------------------------------------------------------------

def sinusoid_table(max_length: int, dim_model: int) -> jnp.ndarray:
    """Precomputed (max_length, dim_model) table, identical layout to the
    reference buffer: even columns sin, odd columns cos."""
    position = np.arange(max_length, dtype=np.float32)[:, None]
    exp_term = np.exp(np.arange(0, dim_model, 2, dtype=np.float32)
                      * -(math.log(10000.0) / dim_model))
    pe = np.zeros((max_length, dim_model), dtype=np.float32)
    pe[:, 0::2] = np.sin(position * exp_term)
    pe[:, 1::2] = np.cos(position * exp_term)
    return jnp.asarray(pe)


# ---------------------------------------------------------------------------
# Multi-head attention (common_layers.py:144-225)
# ---------------------------------------------------------------------------

# Fused train-attention kernel gate (ops/attention_fused.py). TPU-only:
# the XLA formulation below stays for CPU/eval, and interpret-mode tests
# exercise the kernel explicitly. FLASH_ATTN=0 env flips it off for A/Bs.
FLASH_ATTN_ENABLED = os.environ.get("FLASH_ATTN", "1") != "0"


def flash_attn_fits(num_heads: int, Tq: int, Tk: int) -> bool:
    """The kernel keeps whole (H·Tq, Tk) score tiles in VMEM scratch —
    2×f32 + 1×bf16 in the backward (~10 B/elem) plus the q/k/v/g blocks.
    Long buckets (src_buckets ladders reach 4000 frames) overflow the
    ~16 MB of VMEM, so gate by the estimate and fall back to the XLA
    formulation; at ≤8 MB scratch the win was measured, beyond it the
    kernel would not even compile."""
    return num_heads * Tq * Tk * 10 <= 8 * 1024 * 1024


def _use_flash_attn(mask, num_heads: int, Tq: int, Tk: int) -> bool:
    return (FLASH_ATTN_ENABLED and mask is not None
            and jax.default_backend() == "tpu"
            and flash_attn_fits(num_heads, Tq, Tk))

def init_mha(key, num_heads: int, dim_model: int, dim_key: int,
             dim_value: int, rank: int = 0) -> Params:
    kq, kk, kv, ko, kln = jax.random.split(key, 5)
    return {
        "q": init_dense(kq, dim_model, num_heads * dim_key, rank=rank),
        "k": init_dense(kk, dim_model, num_heads * dim_key, rank=rank),
        "v": init_dense(kv, dim_model, num_heads * dim_value, rank=rank),
        "out": init_dense(ko, num_heads * dim_value, dim_model, rank=rank),
        "ln": init_layer_norm(dim_model),
    }


def mha(p: Params, query: jnp.ndarray, key_: jnp.ndarray, value: jnp.ndarray,
        num_heads: int, dim_key: int, dim_value: int,
        mask: Optional[jnp.ndarray] = None,
        dropout_rate: float = 0.0, deterministic: bool = True,
        rng=None, dtype=jnp.bfloat16, seq_par: bool = False) -> jnp.ndarray:
    """Post-LN residual MHA.

    query/key_/value: (B, T, H). mask: (B, T_q, T_k) bool, True = masked
    (additive -inf before softmax, as common_layers.py:218-219).
    Softmax and the residual/LayerNorm run in float32; the four projections
    and both attention matmuls run in `dtype` (bf16 on TPU → MXU).

    seq_par (encoder self-attn only): inputs arrive with T sharded on the
    'model' mesh axis (parallel/sp.py); the projections/attention run on
    the gathered sequence, the residual/dropout/LN segment runs
    T-sharded — GSPMD lowers the out-projection's TP all-reduce as a
    reduce-scatter.
    """
    B, Tq, _ = query.shape
    Tk = key_.shape[1]
    residual = query
    if seq_par:
        from end2end_asr_tpu.parallel import sp
        query = sp.full(query)
        key_ = sp.full(key_)
        value = sp.full(value)

    q = dense(p["q"], query, dtype).reshape(B, Tq, num_heads, dim_key)
    k = dense(p["k"], key_, dtype).reshape(B, Tk, num_heads, dim_key)
    v = dense(p["v"], value, dtype).reshape(B, Tk, num_heads, dim_value)

    scale = 1.0 / math.sqrt(dim_key)  # temperature = sqrt(dim_key)
    training = not deterministic and dropout_rate > 0.0

    # thresh 0 (rate ≈ 1) would divide by zero in the kernel's scale;
    # the XLA path above handles it (dropout returns zeros)
    if (training and dropout_thresh16(dropout_rate) > 0
            and _use_flash_attn(mask, num_heads, Tq, Tk)):
        from end2end_asr_tpu.ops import attention_fused as AF
        rng, sub = jax.random.split(rng)
        bias = jnp.where(mask, jnp.float32(-1e9), jnp.float32(0.0))
        out = AF.flash_mha_train(
            jnp.swapaxes(q, 1, 2), jnp.swapaxes(k, 1, 2),
            jnp.swapaxes(v, 1, 2), jax.lax.stop_gradient(bias),
            AF.seed_from_key(sub), dropout_rate)
        out = jnp.swapaxes(out, 1, 2)
    else:
        def attn_core(q, k, v, mask, sub):
            attn = (jnp.einsum("bqhd,bkhd->bhqk", q, k).astype(jnp.float32)
                    * scale)
            if mask is not None:
                attn = jnp.where(mask[:, None, :, :], -jnp.inf, attn)
            attn = jax.nn.softmax(attn, axis=-1).astype(dtype)
            if sub is not None:
                attn = dropout(sub, attn, dropout_rate, deterministic)
            return jnp.einsum("bhqk,bkhd->bqhd", attn, v)

        if training:
            rng, sub = jax.random.split(rng)
            out = attn_core(q, k, v, mask, sub)
        else:
            out = attn_core(q, k, v, mask, None)
    out = out.reshape(B, Tq, num_heads * dim_value)
    out = dense(p["out"], out.astype(dtype), dtype).astype(jnp.float32)
    if seq_par:
        from end2end_asr_tpu.parallel import sp
        out = sp.seq(out)  # reduce-scatter point of the row-parallel out
    if not deterministic and dropout_rate > 0.0:
        rng, sub = jax.random.split(rng)
        out = dropout(sub, out, dropout_rate, deterministic)
    return layer_norm(p["ln"], out + residual)


# ---------------------------------------------------------------------------
# Position-wise FFN, conv-kernel-1 variant (common_layers.py:124-142)
# ---------------------------------------------------------------------------

def init_ffn(key, dim_model: int, dim_hidden: int, rank: int = 0) -> Params:
    k1, k2 = jax.random.split(key)
    return {
        # Conv1d(dim, hidden, 1) ≡ Dense(dim → hidden); torch conv weight is
        # (out, in, 1) with fan_in = in*1, so init math is identical.
        "w1": init_dense(k1, dim_model, dim_hidden, rank=rank),
        "w2": init_dense(k2, dim_hidden, dim_model, rank=rank),
        "ln": init_layer_norm(dim_model),
    }


def ffn(p: Params, x: jnp.ndarray, dropout_rate: float = 0.0,
        deterministic: bool = True, rng=None, dtype=jnp.bfloat16,
        seq_par: bool = False) -> jnp.ndarray:
    residual = x
    if seq_par:
        from end2end_asr_tpu.parallel import sp
        x = sp.full(x)  # all-gather(T) into the column-parallel w1
    h = jax.nn.relu(dense(p["w1"], x, dtype))
    h = dense(p["w2"], h, dtype).astype(jnp.float32)
    if seq_par:
        from end2end_asr_tpu.parallel import sp
        h = sp.seq(h)  # reduce-scatter point of the row-parallel w2
    if not deterministic and dropout_rate > 0.0:
        h = dropout(rng, h, dropout_rate, deterministic)
    return layer_norm(p["ln"], h + residual)
