"""Beam finished-pool cap: stress vs provably-exact pools.

The device beam keeps the top pool_factor·W finished hypotheses by raw
score where the reference keeps ALL (transformer.py:469-492).
pool_factor >= n_steps+1 is provably exact (at most W retire per step,
plus W forced-EOS at the end), and BeamDecoder now auto-raises to exact
when that pool is cheap (decoding/beam.py AUTO_EXACT_POOL_ELEMS).

The storm test drives adversarial early-EOS decoders (EOS competitive
at every step → dozens of finished hypotheses per utterance) with a
large c_weight (so final-score reranking has maximal room to promote a
low-raw hypothesis the cap would drop) and pins the measured fact that
even a pool capped at W entries (pool_factor=1) never flips the 1-best:
raw scores only decrease as steps accumulate log-probs, the cap drops
the lowest raw scores, and the sqrt(num_words)·c_weight bonus grows too
slowly to bridge the gap at these scales. The auto-exact default needs
no such argument — it is compared against the exact pool entry-for-
entry.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from end2end_asr_tpu.config import Config, EOS_TOKEN
from end2end_asr_tpu.decoding.beam import AUTO_EXACT_POOL_ELEMS, BeamDecoder
from end2end_asr_tpu.models.transformer import (dims_from_config,
                                                init_transformer)

V = 12
ID2LABEL = {i: c for i, c in enumerate("¶§¤abcdef gh")}
SPACE_ID = 9


def _cfg(**kw):
    base = dict(num_layers=1, num_heads=2, dim_model=32, dim_key=16,
                dim_value=16, dim_inner=64, dim_emb=32, feat_extractor="",
                dropout=0.0, dtype="float32", beam_width=4, c_weight=1.5,
                decode_max_len=300, src_max_len=64, tgt_max_len=400)
    base.update(kw)
    return Config(**base)


def _storm_model(seed: int, eos_scale: float = 2.5):
    """Random decoder with EOS (and space, for word-count variance) made
    competitive at every step — an early-EOS retirement storm."""
    cfg = _cfg()
    dims = dims_from_config(cfg)
    params, _ = jax.jit(functools.partial(
        init_transformer, cfg=cfg, num_vocab=V))(jax.random.PRNGKey(seed))
    w = params["decoder"]["output_linear"]["w"] * 2.0
    rs = np.random.RandomState(seed)
    for col in (EOS_TOKEN, SPACE_ID):
        w = w.at[:, col].set(
            jnp.asarray(rs.randn(32).astype(np.float32) * eos_scale))
    params["decoder"]["output_linear"]["w"] = w
    enc = jnp.asarray(np.random.RandomState(seed + 100).randn(2, 40, 32),
                      jnp.float32)
    return cfg, dims, params, enc


def _nbest(cfg, dims, params, enc, pool_factor, auto_exact, nbest=1000):
    dec = BeamDecoder(cfg, dims, ID2LABEL, pool_factor=pool_factor,
                      stage_len=0, auto_exact=auto_exact)
    return dec.decode_nbest(params, enc, nbest=nbest)


def _key(r, n=None):
    return [[(h.text, round(h.final, 5), round(h.raw, 4))
             for h in (u if n is None else u[:n])] for u in r]


def test_pool_factor_for_logic():
    cfg = _cfg()
    dims = dims_from_config(cfg)
    d = BeamDecoder(cfg, dims, ID2LABEL, pool_factor=4, stage_len=0)
    # small searches go exact automatically
    assert d._pool_factor_for(8, 64) == 65
    # a caller factor beyond exact is capped AT exact (identical result,
    # less memory)
    assert d._pool_factor_for(4, 20) == 21
    big = BeamDecoder(cfg, dims, ID2LABEL, pool_factor=10**6, stage_len=0)
    assert big._pool_factor_for(8, 300) == 301
    # long searches keep the configured cap
    assert d._pool_factor_for(8, 300) == 4
    assert (301 * 8 * 302) > AUTO_EXACT_POOL_ELEMS
    # and disabling auto_exact keeps the cap even when cheap
    manual = BeamDecoder(cfg, dims, ID2LABEL, pool_factor=4, stage_len=0,
                         auto_exact=False)
    assert manual._pool_factor_for(8, 64) == 4


@pytest.mark.parametrize("seed", [1, 2])
def test_storm_capped_pool_never_flips_1best(seed):
    cfg, dims, params, enc = _storm_model(seed)
    exact = _nbest(cfg, dims, params, enc, 10**6, False)
    # genuinely stormy: far more finished hypotheses than the cap keeps
    assert min(len(u) for u in exact) > 3 * cfg.beam_width, \
        [len(u) for u in exact]
    tight = _nbest(cfg, dims, params, enc, 1, False)   # pool = W entries
    default = _nbest(cfg, dims, params, enc, 4, False)
    assert _key(tight, 1) == _key(exact, 1)
    assert _key(default, 1) == _key(exact, 1)
    # every capped entry is a true hypothesis from the exact pool (the
    # cap only DROPS entries — deep n-best lists may interleave
    # differently because the cap drops by raw score while ranking is
    # by final score; the 1-best above is what the CLI reports)
    for got, ref in zip(_key(default), _key(exact)):
        ref_set = set(ref)
        assert all(h in ref_set for h in got)


@pytest.mark.parametrize("seed", [1, 2])
def test_auto_exact_matches_exact_everywhere(seed):
    """The production default (auto_exact=True) must equal the provably
    exact pool entry-for-entry, full n-best list."""
    cfg, dims, params, enc = _storm_model(seed)
    exact = _nbest(cfg, dims, params, enc, 10**6, False)
    auto = _nbest(cfg, dims, params, enc, 4, True)
    assert _key(auto) == _key(exact)
