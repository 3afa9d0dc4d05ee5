"""Progressive (short-cache-first) decoding must be EXACT.

Cache length is numerically inert (attention masks positions <= t), so
greedy tokens before the first EOS and a beam pool whose hypotheses all
retired before the cap are identical at any max_len. These tests force
both the stage-1-sufficient and the rerun paths and compare against the
single full-length search.
"""

import numpy as np
import jax.numpy as jnp

from end2end_asr_tpu.config import Config
from end2end_asr_tpu.decoding.beam import BeamDecoder
from end2end_asr_tpu.decoding.greedy import (greedy_decode,
                                             greedy_decode_progressive)
from end2end_asr_tpu.models.transformer import (dims_from_config,
                                                init_transformer)

import jax

CFG = Config(num_layers=1, num_heads=2, dim_model=32, dim_key=16,
             dim_value=16, dim_inner=64, dim_emb=32, feat_extractor="",
             sample_rate=8000, beam_width=3, tgt_max_len=64)
VOCAB = 12


def _setup(seed=0):
    params, _ = init_transformer(jax.random.PRNGKey(seed), CFG,
                                 num_vocab=VOCAB)
    dims = dims_from_config(CFG)
    enc = jnp.asarray(np.random.RandomState(seed).randn(3, 8, 32),
                      jnp.float32)
    return params, dims, enc


def test_progressive_greedy_exact_both_paths():
    params, dims, enc = _setup()
    full = np.asarray(greedy_decode(params, enc, dims, max_len=12))
    for stage in (2, 4, 8, 16):  # tiny stages force reruns; 16 > max_len
        prog = np.asarray(greedy_decode_progressive(
            params, enc, dims, max_len=12, stage_len=stage))
        np.testing.assert_array_equal(prog, full)


def test_progressive_beam_exact(monkeypatch):
    params, dims, enc = _setup(seed=1)
    id2label = {i: chr(ord("a") + i) for i in range(VOCAB)}
    ref = BeamDecoder(CFG, dims, id2label, stage_len=0)
    for stage in (1, 2, 4):
        two = BeamDecoder(CFG, dims, id2label, stage_len=stage)
        r_ref = ref.decode_nbest(params, enc, nbest=3)
        r_two = two.decode_nbest(params, enc, nbest=3)
        for a, b in zip(r_ref, r_two):
            assert [h.ids for h in a] == [h.ids for h in b]
            np.testing.assert_allclose([h.final for h in a],
                                       [h.final for h in b], rtol=1e-6)
