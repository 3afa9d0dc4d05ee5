"""Gradient accumulation (--grad-accum K, training/steps.py): K
sequential microbatches inside one jitted step must produce EXACTLY the
full-batch loss/grads/update — the CE masked-mean is re-weighted by each
microbatch's non-PAD token count, CTC 'mean' by uniform weights.

Beyond the reference's capability (it has no accumulation); the value on
TPU is ~K x lower peak activation memory at identical numerics,
composing with --remat (SURVEY.md §7 memory levers).
"""

import functools

import jax
import numpy as np
import pytest

from end2end_asr_tpu.config import Config
from end2end_asr_tpu.models.transformer import (dims_from_config,
                                                init_transformer)
from end2end_asr_tpu.training.optimizer import init_adam_state
from end2end_asr_tpu.training.steps import make_train_step

CFG = Config(num_layers=2, num_heads=4, dim_model=64, dim_key=16,
             dim_value=16, dim_inner=128, dim_emb=64, feat_extractor="",
             dim_input=161, dtype="float32", dropout=0.0,
             src_max_len=64, tgt_max_len=16, src_buckets=(64,),
             tgt_buckets=(8,))
V = 24


def _batch(B, seed=0):
    rs = np.random.RandomState(seed)
    spect = rs.randn(B, 161, 64).astype(np.float32)
    nf = np.full(B, 64, np.int32)
    tg = np.zeros((B, 8), np.int32)
    tg[:, 0] = 1
    # RAGGED target lengths so microbatch token counts differ — the
    # re-weighting must still reproduce the global masked mean
    for b in range(B):
        n = 2 + (b % 4)
        tg[b, 1:1 + n] = rs.randint(3, V, size=n)
        tg[b, 1 + n] = 2
    tl = np.array([3 + (b % 4) for b in range(B)], np.int32)
    return spect, nf, tg, tl


def _init(cfg):
    return jax.jit(functools.partial(init_transformer, cfg=cfg,
                                     num_vocab=V))(jax.random.PRNGKey(0))


@pytest.mark.parametrize("loss_type", ["ce", "ctc"])
@pytest.mark.parametrize("accum", [2, 4])
def test_grad_accum_matches_full_batch(loss_type, accum):
    cfg1 = CFG.replace(loss=loss_type,
                       label_smoothing=0.1 if loss_type == "ce" else 0.0)
    cfgK = cfg1.replace(grad_accum=accum)
    spect, nf, tg, tl = _batch(8)
    rng = jax.random.PRNGKey(7)

    params, state = _init(cfg1)
    step1 = make_train_step(cfg1, dims_from_config(cfg1), from_pcm=False)
    p1, o1, s1, m1, hyp1, gold1 = step1(params, init_adam_state(params),
                                        state, rng, spect, nf, tg, tl,
                                        spect_T=64)

    params, state = _init(cfg1)  # fresh (step donates buffers)
    stepK = make_train_step(cfgK, dims_from_config(cfgK), from_pcm=False)
    pK, oK, sK, mK, hypK, goldK = stepK(params, init_adam_state(params),
                                        state, rng, spect, nf, tg, tl,
                                        spect_T=64)

    # dropout=0: the only numeric difference is fp reassociation
    assert abs(float(m1["loss"]) - float(mK["loss"])) < 1e-6
    assert int(m1["num_token"]) == int(mK["num_token"])
    assert int(m1["num_correct"]) == int(mK["num_correct"])
    np.testing.assert_array_equal(np.asarray(gold1), np.asarray(goldK))
    np.testing.assert_array_equal(np.asarray(hyp1), np.asarray(hypK))
    for a, b in zip(jax.tree_util.tree_leaves(p1),
                    jax.tree_util.tree_leaves(pK)):
        # microbatch matmuls have different shapes, so grads differ by fp
        # reassociation (~1e-6 rel); Adam's step-1 normalization
        # (m̂/√v̂ ≈ sign(g)) amplifies that into ~1e-5 absolute on params
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=5e-5)


def test_grad_accum_must_divide_batch():
    cfg = CFG.replace(grad_accum=3)
    params, state = _init(cfg)
    step = make_train_step(cfg, dims_from_config(cfg), from_pcm=False)
    spect, nf, tg, tl = _batch(8)
    with pytest.raises(ValueError):
        step(params, init_adam_state(params), state,
             jax.random.PRNGKey(0), spect, nf, tg, tl, spect_T=64)


def test_grad_accum_with_frontend_and_pcm():
    """BN state threads through the scan (vgg frontend, from_pcm)."""
    from __graft_entry__ import _synthetic_batch

    cfg = Config(num_layers=1, num_heads=2, dim_model=32, dim_key=16,
                 dim_value=16, dim_inner=64, dim_emb=32,
                 feat_extractor="vgg_cnn", dtype="float32", dropout=0.0,
                 src_max_len=64, tgt_max_len=16, grad_accum=2)
    params, state = _init(cfg)
    step = make_train_step(cfg, dims_from_config(cfg), from_pcm=True)
    pcm, nf, tg, tl = _synthetic_batch(cfg, 4, 64, 8)
    tg = np.minimum(tg, V - 1).astype(np.int32)
    p, o, s, m, hyp, gold = step(params, init_adam_state(params), state,
                                 jax.random.PRNGKey(1), pcm, nf, tg, tl,
                                 spect_T=64)
    assert np.isfinite(float(m["loss"]))
    assert hyp.shape[0] == 4
