"""Decode correctness: the KV-cached decode_step must equal full-prefix
recompute (the reference's greedy re-runs the full decoder each step,
transformer.py:332-348; with dropout off the cached step is exact)."""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from end2end_asr_tpu.config import Config, SOS_TOKEN
from end2end_asr_tpu.models import decoder as D
from end2end_asr_tpu.models import layers as L
from end2end_asr_tpu.models.transformer import dims_from_config, init_transformer

CFG = Config(num_layers=2, num_heads=4, dim_model=64, dim_key=16,
             dim_value=16, dim_inner=128, dim_emb=64, feat_extractor="",
             dtype="float32", tgt_max_len=64)
V = 20
NH, DK, DV, DM = 4, 16, 16, 64


def _full_prefix_logits(dec, toks, enc):
    """Reference greedy semantics: emb+PE, causal mask only, no key-pad
    mask, no cross mask, non-pad ones (transformer.py:336-350)."""
    B, T = toks.shape
    x = dec["embedding"][toks] + dec["pe"][None, :T]
    self_mask = L.subsequent_mask(B, T)
    out = x
    for lp in dec["layers"]:
        out = L.mha(lp["self_attn"], out, out, out, NH, DK, DV,
                    mask=self_mask, dtype=jnp.float32)
        out = L.mha(lp["enc_attn"], out, enc, enc, NH, DK, DV,
                    mask=None, dtype=jnp.float32)
        out = L.ffn(lp["ffn"], out, dtype=jnp.float32)
    return D.output_logits(dec, out, jnp.float32)


def test_cached_step_equals_full_prefix():
    params, _ = jax.jit(functools.partial(
        init_transformer, cfg=CFG, num_vocab=V))(jax.random.PRNGKey(0))
    dims = dims_from_config(CFG)
    dec = params["decoder"]
    B, T_enc, Ldec = 2, 12, 7
    rs = np.random.RandomState(0)
    enc = jnp.asarray(rs.randn(B, T_enc, DM), jnp.float32)
    toks = jnp.concatenate(
        [jnp.full((B, 1), SOS_TOKEN, jnp.int32),
         jnp.asarray(rs.randint(3, V, size=(B, Ldec - 1)), jnp.int32)],
        axis=1)

    ref = jax.jit(_full_prefix_logits)(dec, toks, enc)

    @jax.jit
    def run_cached(dec, toks, enc):
        cache = D.init_cache(dec, enc, Ldec, NH, DK, DV, dtype=jnp.float32)

        def body(cache, t):
            lg, cache = D.decode_step(dec, cache, toks[:, t], t, NH, DK, DV,
                                      DM, dtype=jnp.float32)
            return cache, lg

        _, logits = jax.lax.scan(body, cache, jnp.arange(Ldec))
        return jnp.transpose(logits, (1, 0, 2))

    got = run_cached(dec, toks, enc)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)
