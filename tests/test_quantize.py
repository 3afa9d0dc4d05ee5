"""Weight-only int8 PTQ (models/quantize.py): quantization error
bounds, structural dispatch through layers.dense /
decoder.output_logits / decoder.fused_qkv_weights, tied-head
materialization, and teacher-forced logit closeness on a full model.
Decode-id parity on a TRAINED model is pinned in test_e2e_overfit.py.
Serving feature beyond the reference (it evaluates in f32,
test.py:60-98)."""

import functools
import pytest

import jax
import jax.numpy as jnp
import numpy as np

from end2end_asr_tpu.config import Config
from end2end_asr_tpu.models import layers as L
from end2end_asr_tpu.models.quantize import (quantize_dense,
                                             quantize_for_inference)
from end2end_asr_tpu.models.transformer import (dims_from_config, forward,
                                                init_transformer)

pytestmark = pytest.mark.slow  # full-grad compiles / long e2e soak

CFG = Config(num_layers=2, num_heads=4, dim_model=64, dim_key=16,
             dim_value=16, dim_inner=128, dim_emb=64, feat_extractor="",
             dim_input=161, dtype="float32", dropout=0.0,
             src_max_len=64, tgt_max_len=16, src_buckets=(64,),
             tgt_buckets=(8,))
V = 24


def test_quantize_dense_error_bound():
    rs = np.random.RandomState(0)
    w = rs.randn(96, 48).astype(np.float32) * rs.uniform(0.01, 3.0, 48)
    q = quantize_dense({"w": jnp.asarray(w), "b": jnp.zeros(48)})
    assert q["q8"].dtype == jnp.int8
    assert q["scale"].shape == (48,)
    deq = np.asarray(q["q8"], np.float32) * np.asarray(q["scale"])
    # symmetric round-to-nearest: |w - deq| <= scale/2 per element
    assert np.all(np.abs(w - deq) <= np.asarray(q["scale"]) / 2 + 1e-7)
    # zero column does not divide by zero
    w0 = np.zeros((8, 3), np.float32)
    q0 = quantize_dense({"w": jnp.asarray(w0)})
    assert np.all(np.asarray(q0["q8"]) == 0)


def test_dense_dispatches_q8():
    rs = np.random.RandomState(1)
    w = rs.randn(32, 16).astype(np.float32)
    b = rs.randn(16).astype(np.float32)
    x = rs.randn(4, 32).astype(np.float32)
    y = L.dense({"w": jnp.asarray(w), "b": jnp.asarray(b)},
                jnp.asarray(x))
    yq = L.dense(quantize_dense({"w": jnp.asarray(w), "b": jnp.asarray(b)}),
                 jnp.asarray(x))
    # per-channel int8: ~1% relative of the channel magnitude
    np.testing.assert_allclose(np.asarray(yq), np.asarray(y),
                               atol=0.05 * np.abs(y).max())


def _init(cfg):
    return jax.jit(functools.partial(init_transformer, cfg=cfg,
                                     num_vocab=V))(jax.random.PRNGKey(0))


def _batch(B=4):
    rs = np.random.RandomState(0)
    spect = rs.randn(B, 161, 64).astype(np.float32)
    nf = np.full(B, 64, np.int32)
    tg = np.zeros((B, 8), np.int32)
    tg[:, 0] = 1
    tg[:, 1:4] = rs.randint(3, V, size=(B, 3))
    tg[:, 4] = 2
    tl = np.full(B, 5, np.int32)
    return spect, nf, tg, tl


def test_full_model_logits_close_and_structure():
    params, state = _init(CFG)
    qparams = quantize_for_inference(params)

    # every encoder/decoder 2-D dense weight became q8; LN / PE /
    # embedding stayed f32
    enc0 = qparams["encoder"]["layers"][0]
    assert "q8" in enc0["self_attn"]["q"] and "w" not in enc0["self_attn"]["q"]
    assert "q8" in enc0["ffn"]["w1"]
    assert "scale" in enc0["self_attn"]["ln"]  # LayerNorm untouched
    assert qparams["decoder"]["embedding"].dtype == jnp.float32
    # tied head materialized as a quantized output projection
    if "output_linear" not in params["decoder"]:
        assert "q8" in qparams["decoder"]["output_linear"]

    spect, nf, tg, tl = _batch()
    dims = dims_from_config(CFG)
    fwd = jax.jit(functools.partial(forward, dims=dims, train=False))
    pred, gold, _ = fwd(params, state, spect, nf, tg)
    predq, goldq, _ = fwd(qparams, state, spect, nf, tg)
    np.testing.assert_array_equal(np.asarray(gold), np.asarray(goldq))
    np.testing.assert_allclose(np.asarray(predq), np.asarray(pred),
                               atol=0.15 * np.abs(np.asarray(pred)).max())


def test_fused_qkv_stays_int8():
    from end2end_asr_tpu.models.decoder import fused_qkv_weights

    params, _ = _init(CFG)
    qparams = quantize_for_inference(params)
    fused = fused_qkv_weights(qparams["decoder"])
    assert fused[0] is not None and fused[0]["q8"].dtype == jnp.int8
    # dequantized fused projection matches the f32 fused projection
    f32 = fused_qkv_weights(params["decoder"], dtype=jnp.float32)
    deq = (np.asarray(fused[0]["q8"], np.float32)
           * np.asarray(fused[0]["scale"]))
    ref = np.asarray(f32[0]["w"], np.float32)
    colmax = np.abs(ref).max(axis=0)
    assert np.all(np.abs(deq - ref) <= colmax / 254 + 1e-6)
    np.testing.assert_allclose(np.asarray(fused[0]["b"]),
                               np.asarray(f32[0]["b"]))


def test_tied_head_materialized_quantized():
    from end2end_asr_tpu.models.decoder import output_logits

    cfg = CFG.replace(emb_trg_sharing=True, dim_emb=CFG.dim_model)
    params, _ = _init(cfg)
    dec = params["decoder"]
    assert "output_linear" not in dec  # tied in the f32 model
    qdec = quantize_for_inference(params)["decoder"]
    assert "q8" in qdec["output_linear"]
    rs = np.random.RandomState(2)
    h = jnp.asarray(rs.randn(4, CFG.dim_model).astype(np.float32))
    y = output_logits(dec, h, dtype=jnp.float32)
    yq = output_logits(qdec, h, dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(yq), np.asarray(y),
                               atol=0.05 * np.abs(np.asarray(y)).max())


def test_lowrank_params_left_unquantized():
    cfg = CFG.replace(model="LRTRFS", rank=8)
    params, _ = _init(cfg)
    qparams = quantize_for_inference(params)
    q0 = qparams["encoder"]["layers"][0]["self_attn"]["q"]
    assert "u" in q0 and "q8" not in q0