"""Model construction / forward-shape / mask / preprocess tests.

NOTE: eager (op-by-op) dispatch is pathologically slow in this image, so
every model call here goes through jax.jit.
"""

import functools

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from end2end_asr_tpu.config import Config, EOS_TOKEN, PAD_TOKEN, SOS_TOKEN
from end2end_asr_tpu.models import layers as L
from end2end_asr_tpu.models.decoder import preprocess_targets
from end2end_asr_tpu.models.frontend import frontend_out_time
from end2end_asr_tpu.models.transformer import (dims_from_config, forward,
                                                init_transformer)

CFG_MINI = Config(num_layers=2, num_heads=4, dim_model=64, dim_key=16,
                  dim_value=16, dim_inner=128, dim_emb=64, dim_input=161,
                  feat_extractor="", tgt_max_len=64, src_max_len=256,
                  dtype="float32")


def test_preprocess_targets_double_sos_eos_quirk():
    # dataset emits SOS + chars + EOS (data_loader.py:135-141); preprocess
    # re-wraps (transformer.py:254-266)
    tgt = jnp.array([[SOS_TOKEN, 5, 6, EOS_TOKEN, PAD_TOKEN, PAD_TOKEN],
                     [SOS_TOKEN, 7, EOS_TOKEN, PAD_TOKEN, PAD_TOKEN, PAD_TOKEN]])
    seq_in, seq_out = preprocess_targets(tgt)
    assert seq_in.shape == (2, 7)
    np.testing.assert_array_equal(
        np.asarray(seq_in[0]),
        [SOS_TOKEN, SOS_TOKEN, 5, 6, EOS_TOKEN, EOS_TOKEN, EOS_TOKEN])
    np.testing.assert_array_equal(
        np.asarray(seq_out[0]),
        [SOS_TOKEN, 5, 6, EOS_TOKEN, EOS_TOKEN, PAD_TOKEN, PAD_TOKEN])
    np.testing.assert_array_equal(
        np.asarray(seq_in[1]),
        [SOS_TOKEN, SOS_TOKEN, 7, EOS_TOKEN, EOS_TOKEN, EOS_TOKEN, EOS_TOKEN])
    np.testing.assert_array_equal(
        np.asarray(seq_out[1]),
        [SOS_TOKEN, 7, EOS_TOKEN, EOS_TOKEN, PAD_TOKEN, PAD_TOKEN, PAD_TOKEN])


def test_preprocess_pad_to():
    tgt = jnp.array([[SOS_TOKEN, 5, EOS_TOKEN]])
    seq_in, seq_out = preprocess_targets(tgt, pad_to=8)
    assert seq_in.shape == (1, 8)
    assert np.all(np.asarray(seq_in[0, 4:]) == EOS_TOKEN)
    assert np.all(np.asarray(seq_out[0, 4:]) == PAD_TOKEN)


def test_masks_match_reference_semantics():
    lengths = jnp.array([3, 5])
    m = L.non_pad_mask_from_lengths(lengths, 5)
    np.testing.assert_array_equal(np.asarray(m[0, :, 0]), [1, 1, 1, 0, 0])
    np.testing.assert_array_equal(np.asarray(m[1, :, 0]), [1, 1, 1, 1, 1])
    # lengths beyond T mask nothing (the conv no-op quirk)
    m2 = L.non_pad_mask_from_lengths(jnp.array([100]), 5)
    assert float(m2.sum()) == 5.0

    am = L.attn_pad_mask_from_lengths(lengths, 5, 2)
    assert am.shape == (2, 2, 5)
    np.testing.assert_array_equal(np.asarray(am[0, 0]),
                                  [False, False, False, True, True])

    sm = L.subsequent_mask(1, 4)[0]
    assert not sm[2, 2] and sm[2, 3] and not sm[3, 0]


def test_sinusoid_table_matches_torch_reference():
    torch = pytest.importorskip("torch")
    import math
    dim, max_len = 32, 50
    pe = torch.zeros(max_len, dim)
    position = torch.arange(0, max_len).unsqueeze(1).float()
    exp_term = torch.exp(torch.arange(0, dim, 2).float()
                         * -(math.log(10000.0) / dim))
    pe[:, 0::2] = torch.sin(position * exp_term)
    pe[:, 1::2] = torch.cos(position * exp_term)
    ours = np.asarray(L.sinusoid_table(max_len, dim))
    np.testing.assert_allclose(ours, pe.numpy(), atol=1e-6)


def _init_jit(cfg, V):
    return jax.jit(functools.partial(init_transformer, cfg=cfg, num_vocab=V)
                   )(jax.random.PRNGKey(0))


@pytest.mark.parametrize("feat", ["", "vgg_cnn", "emb_cnn"])
def test_forward_shapes(feat):
    cfg = CFG_MINI.replace(feat_extractor=feat)
    V = 40
    params, state = _init_jit(cfg, V)
    dims = dims_from_config(cfg)
    B, F, T, U = 2, 161, 80, 10
    spect = jnp.asarray(np.random.RandomState(0).randn(B, F, T), jnp.float32)
    src_lengths = jnp.array([80, 60])
    tgt = jnp.full((B, U), PAD_TOKEN, jnp.int32)
    tgt = tgt.at[:, 0].set(SOS_TOKEN).at[:, 1].set(5).at[:, 2].set(EOS_TOKEN)
    fwd = jax.jit(functools.partial(forward, dims=dims))
    pred, gold, _ = fwd(params, state, spect, src_lengths, tgt)
    assert pred.shape == (B, U + 1, V)
    assert gold.shape == (B, U + 1)
    assert np.all(np.isfinite(np.asarray(pred)))


def test_forward_train_mode_with_dropout_runs():
    cfg = CFG_MINI
    params, state = _init_jit(cfg, 40)
    dims = dims_from_config(cfg)
    spect = jnp.zeros((2, 161, 50))
    tgt = jnp.array([[SOS_TOKEN, 4, EOS_TOKEN, PAD_TOKEN]] * 2)
    fwd = jax.jit(functools.partial(forward, dims=dims, train=True))
    pred, gold, _ = fwd(params, state, spect, jnp.array([50, 30]), tgt,
                        rng=jax.random.PRNGKey(1))
    assert np.all(np.isfinite(np.asarray(pred)))


def test_dropout_u16_mask_semantics():
    # layers.dropout draws uint16 bits and integer-compares against
    # round(keep * 2^16); the keep fraction and the inverse scaling must
    # stay consistent (unbiased estimator of the identity).
    x = jnp.ones((512, 1024), jnp.float32)
    y = np.asarray(jax.jit(L.dropout, static_argnums=(2, 3))(
        jax.random.PRNGKey(3), x, 0.1, False))
    eff_keep = round(0.9 * 65536) / 65536
    frac = float(np.mean(y > 0))
    assert abs(frac - eff_keep) < 3e-3
    assert abs(float(y.mean()) - 1.0) < 6e-3
    kept = y[y > 0]
    np.testing.assert_allclose(kept, 65536.0 / round(0.9 * 65536),
                               rtol=1e-6)
    # identity paths
    assert L.dropout(jax.random.PRNGKey(0), x, 0.0, False) is x
    assert L.dropout(jax.random.PRNGKey(0), x, 0.5, True) is x


def test_conv_dim_input_arithmetic():
    # utils/functions.py:116-133: vgg 161 -> 40*128 = 5120; emb -> 672
    cfg = Config(feat_extractor="vgg_cnn")
    assert cfg.conv_dim_input() == 5120
    cfg = Config(feat_extractor="emb_cnn")
    assert cfg.conv_dim_input() == 672
    cfg = Config(feat_extractor="", dim_input=161)
    assert cfg.conv_dim_input() == 161


def test_remat_train_step_matches_no_remat():
    """--remat: rematerialized layers give identical losses/updates."""
    from end2end_asr_tpu.training.optimizer import init_adam_state
    from end2end_asr_tpu.training.steps import make_train_step

    spect = np.random.RandomState(0).randn(2, 161, 50).astype(np.float32)
    tgt = np.array([[SOS_TOKEN, 5, 6, EOS_TOKEN, 0, 0]] * 2, np.int32)
    losses = []
    for remat in (False, True):
        cfg = CFG_MINI.replace(remat=remat, dropout=0.0)
        params, state = _init_jit(cfg, 40)
        opt = init_adam_state(params)
        step = make_train_step(cfg, dims_from_config(cfg), from_pcm=False)
        _, _, _, m, _, _ = step(params, opt, state, jax.random.PRNGKey(1),
                                spect, np.array([50, 40], np.int32), tgt,
                                np.array([4, 4], np.int32), spect_T=50)
        losses.append(float(m["loss"]))
    assert abs(losses[0] - losses[1]) < 1e-5, losses


def test_emb_cnn_train_step_updates_bn_state():
    """emb_cnn path end-to-end: one train step runs, loss finite, and the
    BatchNorm running stats actually move (functional BN plumbing)."""
    from end2end_asr_tpu.training.optimizer import init_adam_state
    from end2end_asr_tpu.training.steps import make_train_step

    cfg = CFG_MINI.replace(feat_extractor="emb_cnn")
    params, state = _init_jit(cfg, 40)
    opt = init_adam_state(params)
    step = make_train_step(cfg, dims_from_config(cfg), from_pcm=False)
    spect = np.random.RandomState(0).randn(2, 161, 80).astype(np.float32)
    tgt = np.array([[SOS_TOKEN, 5, 6, EOS_TOKEN, 0, 0]] * 2, np.int32)
    before = np.asarray(state["frontend"]["bn1"]["mean"]).copy()
    p2, o2, s2, m, _, _ = step(params, opt, state, jax.random.PRNGKey(1),
                               spect, np.array([80, 60], np.int32), tgt,
                               np.array([4, 4], np.int32), spect_T=80)
    assert np.isfinite(float(m["loss"]))
    after = np.asarray(s2["frontend"]["bn1"]["mean"])
    assert not np.allclose(before, after)


def test_vgg_frontend_output_dim():
    cfg = CFG_MINI.replace(feat_extractor="vgg_cnn")
    params, state = _init_jit(cfg, 40)
    # encoder input linear must accept 5120 features
    assert params["encoder"]["input_linear"]["w"].shape[0] == 5120
