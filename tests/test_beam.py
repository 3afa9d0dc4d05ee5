"""Beam search device-program unit tests (pool invariants, EOS forcing,
greedy fallback)."""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from end2end_asr_tpu.config import Config, EOS_TOKEN, SOS_TOKEN
from end2end_asr_tpu.decoding.beam import (NEG, BeamDecoder,
                                           beam_search_device)
from end2end_asr_tpu.models.transformer import dims_from_config, init_transformer

CFG = Config(num_layers=1, num_heads=2, dim_model=32, dim_key=16,
             dim_value=16, dim_inner=64, dim_emb=32, feat_extractor="",
             dtype="float32", tgt_max_len=64, src_max_len=64,
             beam_width=3, c_weight=0.1)
V = 10


def _setup():
    params, _ = jax.jit(functools.partial(
        init_transformer, cfg=CFG, num_vocab=V))(jax.random.PRNGKey(3))
    dims = dims_from_config(CFG)
    enc = jnp.asarray(np.random.RandomState(0).randn(2, 6, 32), jnp.float32)
    return params, dims, enc


def test_eos_forcing_fills_pool():
    params, dims, enc = _setup()
    T_enc = enc.shape[1]
    pool_t, pool_s, pool_l, _ = beam_search_device(
        params, enc, dims, W=3, n_steps=T_enc, force_eos=True)
    pool_t, pool_s, pool_l = map(np.asarray, (pool_t, pool_s, pool_l))
    for b in range(2):
        valid = pool_s[b] > NEG / 2
        assert valid.any()  # forcing guarantees ended hypotheses
        # scores sorted descending among valid entries
        vs = pool_s[b][valid]
        assert np.all(np.diff(vs) <= 1e-6)
        for p in np.nonzero(valid)[0]:
            L = int(pool_l[b, p])
            assert 2 <= L <= T_enc + 2
            assert pool_t[b, p, 0] == SOS_TOKEN
            assert pool_t[b, p, L - 1] == EOS_TOKEN


def test_beam_decoder_returns_strings_and_nbest():
    params, dims, enc = _setup()
    id2label = {i: chr(ord("a") + i) for i in range(V)}
    dec = BeamDecoder(CFG, dims, id2label)
    hyps = dec.decode(params, enc)
    assert len(hyps) == 2 and all(isinstance(h, str) for h in hyps)
    nbest = dec.decode_nbest(params, enc, nbest=3)
    for utt in nbest:
        assert 1 <= len(utt) <= 3
        ids, s = utt[0].ids, utt[0].text
        assert ids[0] == SOS_TOKEN and ids[-1] == EOS_TOKEN


def test_greedy_fallback_when_nothing_ends():
    # decode_max_len shorter than enc_T → no EOS forcing; with only 2
    # steps a random model rarely emits EOS, so fallback usually fires —
    # and either way decode() must return B non-None strings.
    params, dims, enc = _setup()
    cfg = CFG.replace(decode_max_len=2)
    id2label = {i: chr(ord("a") + i) for i in range(V)}
    dec = BeamDecoder(cfg, dims, id2label)
    enc_long = jnp.concatenate([enc] * 3, axis=1)  # T_enc = 18 > 2
    hyps = dec.decode(params, enc_long)
    assert len(hyps) == 2 and all(isinstance(h, str) for h in hyps)
