"""Weight-only int8 post-training quantization for inference.

Serving-path optimization with no reference counterpart (the reference
evaluates in f32, test.py:60-98): every 2-D dense weight in the
encoder/decoder is stored as int8 with a symmetric per-output-channel
f32 scale; `layers.dense` / `decoder.output_logits` /
`decoder.fused_qkv_weights` dispatch on the {"q8","scale"} structure
and dequantize at use. The autoregressive decode step is latency/HBM
bound on weight reads, so int8 cuts its weight traffic 4× vs f32 (2×
vs a bf16 cache).

Accuracy: int8 values are exactly representable in bf16 and the normal
inference path already rounds weights to bf16 (8 mantissa bits,
~2^-9 relative) before the MXU matmul — per-channel int8 (~2^-8 of the
channel max) adds error of the same order, pinned by
tests/test_quantize.py (logit closeness + decode-id parity on a
trained model).

Quantize-on-load only (test.py/transcribe.py --quantize-int8);
checkpoints stay f32 and training never sees q8 params.
"""

from typing import Any, Dict

import jax.numpy as jnp

Params = Dict[str, Any]


def quantize_dense(p: Params) -> Params:
    """{"w": (in, out), "b"?} -> {"q8": int8, "scale": (out,) f32, "b"?}.

    Symmetric per-output-channel: scale_j = max|w[:, j]| / 127."""
    w = jnp.asarray(p["w"], jnp.float32)
    s = jnp.max(jnp.abs(w), axis=0) / 127.0
    s = jnp.where(s == 0, 1.0, s)
    q = jnp.clip(jnp.round(w / s), -127, 127).astype(jnp.int8)
    out = {"q8": q, "scale": s.astype(jnp.float32)}
    if "b" in p:
        out["b"] = p["b"]
    return out


def _walk(node):
    if isinstance(node, dict):
        if "w" in node and getattr(node["w"], "ndim", 0) == 2:
            return quantize_dense(node)
        return {k: _walk(v) for k, v in node.items()}
    if isinstance(node, (list, tuple)):
        return type(node)(_walk(v) for v in node)
    return node


def quantize_for_inference(params: Params) -> Params:
    """Quantize every encoder/decoder dense weight (q/k/v/out, ffn
    w1/w2, input_linear, output_linear). Embedding lookups, LayerNorm,
    positional tables, and the conv frontend stay f32. A tied output
    head (emb_trg_sharing) is materialized as a quantized
    output_linear — the f32 embedding keeps the input lookup exact.
    Low-rank ("u","v") leaves are left unquantized (their factors are
    already the compression)."""
    out = dict(params)
    if "encoder" in out:
        out["encoder"] = _walk(out["encoder"])
    if "decoder" in out:
        dec = dict(out["decoder"])
        emb = dec.get("embedding")
        dec = _walk(dec)
        if emb is not None:
            dec["embedding"] = emb  # keep the f32 lookup table
            if "output_linear" not in dec:
                dec["output_linear"] = quantize_dense(
                    {"w": jnp.asarray(emb, jnp.float32).T})
        out["decoder"] = dec
    return out
