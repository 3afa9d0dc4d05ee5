"""Transformer container: frontend + encoder + decoder.

Reference: models/asr/transformer.py:16-124 (Transformer.forward /
evaluate) and utils/functions.py:116-162 (factory). The container here is
a param pytree `{"frontend", "encoder", "decoder"}` plus a (possibly empty)
mutable `state` pytree (BatchNorm running stats for emb_cnn).

`forward` is pure and jit-able: (params, state, batch, rng) →
(logits, gold, new_state). Greedy/beam decoding live in
end2end_asr_tpu.decoding and reuse `encode` + the decoder's cached step.
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from end2end_asr_tpu.config import Config
from end2end_asr_tpu.models import decoder as D
from end2end_asr_tpu.models import encoder as E
from end2end_asr_tpu.models import frontend as F

Params = Dict[str, object]


class ModelDims(NamedTuple):
    num_heads: int
    dim_key: int
    dim_value: int
    dim_model: int
    emb_trg_sharing: bool
    dropout: float
    feat_extractor: str
    dtype: object
    ref_compat_masks: bool
    remat: bool = False
    seq_parallel: bool = False
    # GPipe pipeline over the encoder/decoder layer stacks
    # (parallel/pp.py; active only when pp.install'd with a 'pipe' mesh)
    pipeline: bool = False


def dims_from_config(cfg: Config) -> ModelDims:
    return ModelDims(
        num_heads=cfg.num_heads, dim_key=cfg.dim_key, dim_value=cfg.dim_value,
        dim_model=cfg.dim_model, emb_trg_sharing=cfg.emb_trg_sharing,
        dropout=cfg.dropout, feat_extractor=cfg.feat_extractor,
        dtype=jnp.bfloat16 if cfg.dtype == "bfloat16" else jnp.float32,
        ref_compat_masks=cfg.ref_compat_masks, remat=cfg.remat,
        seq_parallel=cfg.seq_parallel,
        pipeline=getattr(cfg, "mesh_pipe", 1) > 1)


def init_transformer(key, cfg: Config, num_vocab: int) -> Tuple[Params, Params]:
    """Build params + state. dim_input follows the conv arithmetic of
    utils/functions.py:116-133."""
    k_f, k_e, k_d = jax.random.split(key, 3)
    dim_input = cfg.conv_dim_input()
    fe_params, fe_state = F.init_frontend(k_f, cfg.feat_extractor)
    # rank > 0 (with --model LRTRFS) = Low-Rank Transformer variant
    if cfg.model == "LRTRFS" and cfg.rank <= 0:
        raise ValueError(
            "--model LRTRFS requires --rank > 0 (the low-rank "
            "factorization width); without it the build would silently "
            "be full-rank")
    rank = cfg.rank if cfg.rank > 0 else 0
    params: Params = {
        "encoder": E.init_encoder(
            k_e, cfg.num_layers, cfg.num_heads, cfg.dim_model, cfg.dim_key,
            cfg.dim_value, dim_input, cfg.dim_inner,
            src_max_length=cfg.src_max_len, rank=rank),
        "decoder": D.init_decoder(
            k_d, num_vocab, cfg.num_layers, cfg.num_heads, cfg.dim_emb,
            cfg.dim_model, cfg.dim_inner, cfg.dim_key, cfg.dim_value,
            trg_max_length=cfg.tgt_max_len,
            emb_trg_sharing=cfg.emb_trg_sharing, rank=rank),
    }
    if fe_params is not None:
        params["frontend"] = fe_params
    state = {"frontend": fe_state} if fe_state else {}
    return params, state


def encoder_lengths(dims: ModelDims, src_lengths: jnp.ndarray) -> jnp.ndarray:
    """Lengths fed to encoder/cross-attn masks.

    ref_compat_masks=True passes raw frame lengths like the reference
    (transformer.py:78), which makes the masks a no-op after conv
    subsampling; False computes the true subsampled lengths.
    """
    if dims.ref_compat_masks or dims.feat_extractor not in ("vgg_cnn", "emb_cnn"):
        return src_lengths
    if dims.feat_extractor == "vgg_cnn":
        return src_lengths // 4
    t1 = (src_lengths + 20 - 11) // 2 + 1
    return t1 - 11 + 1


def encode(params: Params, state: Params, spect: jnp.ndarray,
           src_lengths: jnp.ndarray, dims: ModelDims,
           train: bool = False, rng=None):
    """spect: (B, F, T). Returns (enc_out (B,T',H), enc_lengths, new_state)."""
    fe_state = state.get("frontend") if state else None
    feats, new_fe_state = F.apply_frontend(
        params.get("frontend"), fe_state, spect, dims.feat_extractor,
        train=train, dtype=dims.dtype)
    enc_lens = encoder_lengths(dims, src_lengths)
    if rng is not None:
        rng, sub = jax.random.split(rng)
    else:
        sub = None
    enc_out = E.apply_encoder(
        params["encoder"], feats, enc_lens,
        dims.num_heads, dims.dim_key, dims.dim_value,
        dropout_rate=dims.dropout, deterministic=not train,
        rng=sub, dtype=dims.dtype, remat=dims.remat and train,
        seq_par=dims.seq_parallel, pipe_par=dims.pipeline)
    new_state = dict(state or {})
    if new_fe_state is not None and new_fe_state != {}:
        new_state["frontend"] = new_fe_state
    return enc_out, enc_lens, new_state


def forward(params: Params, state: Params, spect: jnp.ndarray,
            src_lengths: jnp.ndarray, targets: jnp.ndarray,
            dims: ModelDims, train: bool = False, rng=None,
            tgt_pad_to: Optional[int] = None):
    """Training/teacher-forced forward (transformer.py:59-85).

    Returns (pred logits (B,U,V) f32, gold (B,U), new_state).
    """
    if rng is not None:
        rng, r_enc, r_dec = jax.random.split(rng, 3)
    else:
        r_enc = r_dec = None
    enc_out, enc_lens, new_state = encode(
        params, state, spect, src_lengths, dims, train=train, rng=r_enc)
    seq_in, seq_out = D.preprocess_targets(targets, pad_to=tgt_pad_to)
    pred = D.apply_decoder(
        params["decoder"], seq_in, enc_out, enc_lens,
        dims.num_heads, dims.dim_key, dims.dim_value, dims.dim_model,
        emb_trg_sharing=dims.emb_trg_sharing, dropout_rate=dims.dropout,
        deterministic=not train, rng=r_dec, dtype=dims.dtype,
        remat=dims.remat and train, pipe_par=dims.pipeline)
    return pred, seq_out, new_state


def num_params(params: Params) -> int:
    return sum(int(x.size) for x in jax.tree_util.tree_leaves(params))
