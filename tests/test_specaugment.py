"""SpecAugment: mask shapes/bounds, and the augmented train step runs."""

import jax
import jax.numpy as jnp
import numpy as np

from end2end_asr_tpu.ops.specaugment import apply_spec_augment


def test_masks_zero_bands_within_bounds():
    B, F, T = 3, 81, 120
    spect = jnp.ones((B, F, T))
    n_frames = jnp.array([120, 60, 30])
    out = apply_spec_augment(jax.random.PRNGKey(0), spect, n_frames,
                             n_freq_masks=2, freq_width=15,
                             n_time_masks=2, time_width=40)
    out = np.asarray(out)
    assert out.shape == (B, F, T)
    assert ((out == 0) | (out == 1)).all()
    # something got masked, but not everything
    frac = (out == 0).mean()
    assert 0.0 < frac < 0.9
    # time masks confined to valid frames: for utt 2 (30 valid) nothing
    # beyond frame 30 may be zeroed by a TIME mask alone; freq masks zero
    # whole rows, so check a column-wise criterion: columns >= 30 of utt 2
    # are zero only in fully-masked (freq) rows
    full_freq_rows = (out[2, :, :30] == 0).all(axis=1)
    tail = out[2, :, 30:]
    assert (tail[~full_freq_rows] == 1).all()


def test_deterministic_per_key():
    spect = jnp.ones((2, 40, 50))
    nf = jnp.array([50, 50])
    a = apply_spec_augment(jax.random.PRNGKey(7), spect, nf)
    b = apply_spec_augment(jax.random.PRNGKey(7), spect, nf)
    c = apply_spec_augment(jax.random.PRNGKey(8), spect, nf)
    assert np.array_equal(np.asarray(a), np.asarray(b))
    assert not np.array_equal(np.asarray(a), np.asarray(c))


def test_train_step_with_spec_augment():
    import functools
    from end2end_asr_tpu.config import Config
    from end2end_asr_tpu.models.transformer import (dims_from_config,
                                                    init_transformer)
    from end2end_asr_tpu.training.optimizer import init_adam_state
    from end2end_asr_tpu.training.steps import make_train_step

    cfg = Config(num_layers=1, num_heads=2, dim_model=32, dim_key=16,
                 dim_value=16, dim_inner=64, dim_emb=32, feat_extractor="",
                 dim_input=161, dtype="float32", spec_augment=True,
                 freq_mask_width=20, time_mask_width=20)
    params, state = jax.jit(functools.partial(
        init_transformer, cfg=cfg, num_vocab=16))(jax.random.PRNGKey(0))
    opt = init_adam_state(params)
    step = make_train_step(cfg, dims_from_config(cfg), from_pcm=False)
    spect = np.random.RandomState(0).randn(2, 161, 64).astype(np.float32)
    tg = np.array([[1, 5, 6, 2, 0, 0]] * 2, np.int32)
    p2, o2, s2, m, _, _ = step(params, opt, state, jax.random.PRNGKey(1),
                               spect, np.array([64, 40], np.int32), tg,
                               np.array([4, 4], np.int32), spect_T=64)
    assert np.isfinite(float(m["loss"]))
