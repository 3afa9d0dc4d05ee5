"""Low-Rank Transformer variant (Winata et al. ICASSP 2020): factorized
attention/FFN projections selected via Config.rank / --model LRTRFS."""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from end2end_asr_tpu.config import Config
from end2end_asr_tpu.decoding.greedy import greedy_decode
from end2end_asr_tpu.models.transformer import (dims_from_config, forward,
                                                init_transformer)
from end2end_asr_tpu.models.transformer import encode, num_params

CFG = Config(num_layers=2, num_heads=4, dim_model=128, dim_key=32,
             dim_value=32, dim_inner=256, dim_emb=128, feat_extractor="",
             dim_input=161, dtype="float32", tgt_max_len=32,
             src_max_len=128, model="LRTRFS", rank=16)


def _init(cfg, V=30):
    return jax.jit(functools.partial(init_transformer, cfg=cfg,
                                     num_vocab=V))(jax.random.PRNGKey(0))


def test_lowrank_params_smaller_and_forward_works():
    params_lr, state = _init(CFG)
    params_full, _ = _init(CFG.replace(rank=0, model="TRFS"))
    assert num_params(params_lr) < num_params(params_full)
    # q projection factorized: u (128,16), v (16,128)
    q = params_lr["encoder"]["layers"][0]["self_attn"]["q"]
    assert q["u"].shape == (128, 16) and q["v"].shape == (16, 128)

    dims = dims_from_config(CFG)
    spect = jnp.asarray(np.random.RandomState(0).randn(2, 161, 60),
                        jnp.float32)
    tgt = jnp.array([[1, 5, 6, 2, 0, 0]] * 2)
    fwd = jax.jit(functools.partial(forward, dims=dims))
    pred, gold, _ = fwd(params_lr, state, spect, jnp.array([60, 40]), tgt)
    assert pred.shape == (2, 7, 30)
    assert np.all(np.isfinite(np.asarray(pred)))


def test_lowrank_train_and_decode():
    from end2end_asr_tpu.training.optimizer import init_adam_state
    from end2end_asr_tpu.training.steps import make_train_step

    params, state = _init(CFG)
    dims = dims_from_config(CFG)
    opt = init_adam_state(params)
    step = make_train_step(CFG, dims, from_pcm=False)
    spect = np.random.RandomState(0).randn(2, 161, 64).astype(np.float32)
    tgt = np.array([[1, 5, 6, 2, 0, 0]] * 2, np.int32)
    p2, o2, s2, m, hyp, gold = step(
        params, opt, state, jax.random.PRNGKey(1), spect,
        np.array([64, 50], np.int32), tgt, np.array([4, 4], np.int32),
        spect_T=64)
    assert np.isfinite(float(m["loss"]))

    enc_out, _, _ = jax.jit(functools.partial(encode, dims=dims))(
        p2, s2, jnp.asarray(spect), jnp.array([64, 50]))
    ids = greedy_decode(p2, enc_out, dims, max_len=8)
    assert ids.shape == (2, 8)


def test_lrtrfs_without_rank_fails_fast():
    """--model LRTRFS with the default rank=0 must raise, not silently
    build a full-rank model labeled LRTRFS."""
    import functools

    import jax
    import pytest

    from end2end_asr_tpu.config import Config
    from end2end_asr_tpu.models.transformer import init_transformer

    cfg = Config(model="LRTRFS", rank=0, num_layers=1, num_heads=2,
                 dim_model=32, dim_key=16, dim_value=16, dim_inner=64,
                 dim_emb=32, feat_extractor="")
    with pytest.raises(ValueError, match="LRTRFS"):
        init_transformer(jax.random.PRNGKey(0), cfg=cfg, num_vocab=8)
