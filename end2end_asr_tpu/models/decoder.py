"""Transformer decoder: training forward + KV-cached single-step decode.

Reference: models/asr/transformer.py:206-305 (Decoder), :519-545
(DecoderLayer). Reproduced quirks (required for checkpoint parity):

  * `preprocess` prepends SOS to targets that ALREADY begin with SOS and
    appends EOS to targets that already end with EOS (the dataset emits
    SOS+text+EOS, utils/data_loader.py:135-141; preprocess re-wraps,
    transformer.py:254-266) — so seq_in = [SOS, SOS, chars…, EOS] and
    seq_out = [SOS, chars…, EOS, EOS].
  * seq_in is padded with EOS (not PAD) and both the decoder non-pad mask
    and the self-attention key-pad mask use pad_idx=EOS
    (transformer.py:263,282-285), which also masks the sequence's real
    trailing EOS as an attention key.
  * At inference the reference uses non_pad_mask = 1 and NO cross-attention
    mask (transformer.py:336-348,430-443); the cached step here matches
    that exactly (dropout off makes cache ≡ full-prefix recompute).

The reference pads seq_in/seq_out to a fixed tgt_max_len=1000
(common_layers.py:14-22) and pays full decoder compute on it every batch;
here the target width is a static bucket (trainer picks it), which is
numerically identical under the PAD mask but compiles to far less work.
"""

from __future__ import annotations

import math
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp

from end2end_asr_tpu.config import EOS_TOKEN, PAD_TOKEN, SOS_TOKEN
from end2end_asr_tpu.models import layers as L

Params = Dict[str, object]


def init_decoder(key, num_vocab: int, num_layers: int, num_heads: int,
                 dim_emb: int, dim_model: int, dim_inner: int,
                 dim_key: int, dim_value: int, trg_max_length: int = 1000,
                 emb_trg_sharing: bool = False, rank: int = 0) -> Params:
    keys = jax.random.split(key, 2 + num_layers)
    layers_p = []
    for i in range(num_layers):
        ka, kc, kf = jax.random.split(keys[2 + i], 3)
        layers_p.append({
            "self_attn": L.init_mha(ka, num_heads, dim_model, dim_key,
                                    dim_value, rank=rank),
            "enc_attn": L.init_mha(kc, num_heads, dim_model, dim_key,
                                   dim_value, rank=rank),
            "ffn": L.init_ffn(kf, dim_model, dim_inner, rank=rank),
        })
    p: Params = {
        # nn.Embedding re-initialized xavier-uniform by the container
        # (transformer.py:55-57); fan counted over (V, dim_emb).
        "embedding": L.xavier_uniform(keys[0], (num_vocab, dim_emb),
                                      num_vocab, dim_emb),
        "layers": layers_p,
        # +1: preprocess_targets widens a full-length bucket by the
        # prepended SOS (seq width = U+1); rows beyond the reference's
        # trg_max_length buffer are the same deterministic sinusoid
        "pe": L.sinusoid_table(trg_max_length + 1, dim_model),
    }
    if not emb_trg_sharing:
        p["output_linear"] = {"w": L.xavier_uniform(
            keys[1], (dim_model, num_vocab), dim_model, num_vocab)}
    return p


def logit_scale(dim_model: int, emb_trg_sharing: bool) -> float:
    return dim_model ** -0.5 if emb_trg_sharing else 1.0


def output_logits(p: Params, h: jnp.ndarray, dtype=jnp.bfloat16) -> jnp.ndarray:
    """Bias-free output projection; tied to embedding when sharing."""
    if "output_linear" in p:
        ol = p["output_linear"]
        if "q8" in ol:  # int8 PTQ head (models/quantize.py)
            y = (h.astype(dtype) @ ol["q8"].astype(dtype))
            return y.astype(jnp.float32) * ol["scale"]
        w = ol["w"]
    else:
        w = p["embedding"].T
    return (h.astype(dtype) @ w.astype(dtype)).astype(jnp.float32)


# ---------------------------------------------------------------------------
# Target preprocessing (transformer.py:254-266 + common_layers.py:14-22)
# ---------------------------------------------------------------------------

def preprocess_targets(targets: jnp.ndarray,
                       pad_to: Optional[int] = None
                       ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """targets: (B, U) PAD-padded token ids (already SOS…EOS wrapped by the
    dataset). Returns (seq_in, seq_out), both (B, pad_to or U+1).

    seq_in  = SOS + targets, EOS-padded.
    seq_out = targets + EOS, PAD-padded.
    """
    B, U = targets.shape
    width = pad_to if pad_to is not None else U + 1
    lengths = jnp.sum(targets != PAD_TOKEN, axis=1)  # (B,)

    pos = jnp.arange(width)[None, :]

    # seq_in: shift right, SOS in front, replace PAD tail with EOS
    tgt_w = jnp.pad(targets, ((0, 0), (0, max(0, width - U))))[:, :width]
    shifted = jnp.concatenate(
        [jnp.full((B, 1), SOS_TOKEN, targets.dtype), tgt_w[:, :width - 1]], axis=1)
    # position 0 is SOS; positions 1..len hold targets; rest (which held
    # PAD in `shifted`) become EOS.
    seq_in = jnp.where(pos <= lengths[:, None], shifted, EOS_TOKEN)

    # seq_out: targets then EOS then PAD
    seq_out = jnp.where(pos < lengths[:, None], tgt_w,
                        jnp.where(pos == lengths[:, None],
                                  jnp.full_like(tgt_w, EOS_TOKEN),
                                  jnp.full_like(tgt_w, PAD_TOKEN)))
    return seq_in.astype(jnp.int32), seq_out.astype(jnp.int32)


# ---------------------------------------------------------------------------
# Training forward (transformer.py:268-305)
# ---------------------------------------------------------------------------

def apply_decoder(p: Params, seq_in: jnp.ndarray, enc_out: jnp.ndarray,
                  enc_input_lengths: jnp.ndarray,
                  num_heads: int, dim_key: int, dim_value: int,
                  dim_model: int, emb_trg_sharing: bool = False,
                  dropout_rate: float = 0.1, deterministic: bool = True,
                  rng=None, dtype=jnp.bfloat16,
                  remat: bool = False, pipe_par: bool = False) -> jnp.ndarray:
    """Returns logits (B, U, V). pipe_par: GPipe pipeline over the layer
    stack (parallel/pp.py); enc_out and the masks travel with each
    microbatch."""
    B, U = seq_in.shape
    T_enc = enc_out.shape[1]

    non_pad = L.non_pad_mask_from_pad(seq_in, EOS_TOKEN)  # (B,U,1)
    self_mask = (L.attn_key_pad_mask(seq_in, EOS_TOKEN, U)
                 | L.subsequent_mask(B, U))
    cross_mask = L.attn_pad_mask_from_lengths(enc_input_lengths, T_enc, U)

    scale = logit_scale(dim_model, emb_trg_sharing)
    # PE is a fixed (non-trainable) buffer in the reference: stop_gradient
    # so it never enters the grad norm or the Adam update.
    emb = (p["embedding"][seq_in] * scale
           + jax.lax.stop_gradient(p["pe"])[None, :U])
    if rng is not None:
        rng, sub = jax.random.split(rng)
        out = L.dropout(sub, emb, dropout_rate, deterministic)
    else:
        out = emb

    def layer_fn(lp, out, enc_out, non_pad, self_mask, cross_mask,
                 r1, r2, r3):
        out = L.mha(lp["self_attn"], out, out, out, num_heads, dim_key,
                    dim_value, mask=self_mask, dropout_rate=dropout_rate,
                    deterministic=deterministic, rng=r1, dtype=dtype)
        out = out * non_pad
        out = L.mha(lp["enc_attn"], out, enc_out, enc_out, num_heads,
                    dim_key, dim_value, mask=cross_mask,
                    dropout_rate=dropout_rate, deterministic=deterministic,
                    rng=r2, dtype=dtype)
        out = out * non_pad
        out = L.ffn(lp["ffn"], out, dropout_rate=dropout_rate,
                    deterministic=deterministic, rng=r3, dtype=dtype)
        return out * non_pad

    if pipe_par:
        from end2end_asr_tpu.parallel import pp
        if pp.active():
            keyed = rng is not None
            lp_list = []
            for lp in p["layers"]:
                if keyed:
                    rng, r1, r2, r3 = jax.random.split(rng, 4)
                    lp = dict(lp, _r1=r1, _r2=r2, _r3=r3)
                lp_list.append(lp)

            def lstep(lp_i, a, cs, mb_id):
                enc_mb, np_mb, sm_mb, cm_mb = cs
                rs = [(jax.random.fold_in(lp_i[k], mb_id)
                       if keyed else None)
                      for k in ("_r1", "_r2", "_r3")]
                return layer_fn(lp_i, a, enc_mb, np_mb, sm_mb, cm_mb,
                                *rs)

            out = pp.pipeline_apply(
                pp.stack_layers(lp_list), out,
                (enc_out, non_pad, self_mask, cross_mask), lstep,
                remat=remat)
            return output_logits(p, out, dtype)

    if remat:
        layer_fn = jax.checkpoint(layer_fn)

    for lp in p["layers"]:
        if rng is not None:
            rng, r1, r2, r3 = jax.random.split(rng, 4)
        else:
            r1 = r2 = r3 = None
        out = layer_fn(lp, out, enc_out, non_pad, self_mask, cross_mask,
                       r1, r2, r3)

    return output_logits(p, out, dtype)


# ---------------------------------------------------------------------------
# KV-cached single-step decode (replaces the reference's full-prefix re-run
# each of 300 steps, transformer.py:332-348; exact with dropout off)
# ---------------------------------------------------------------------------

def fused_qkv_weights(p: Params, dtype=jnp.bfloat16):
    """Per-layer fused self-attention projection [Wq‖Wk‖Wv] so the decode
    step issues ONE matmul instead of three — the step is latency-bound on
    op count, not FLOPs. Skipped for low-rank params (separate factors)."""
    fused = []
    for lp in p["layers"]:
        sa = lp["self_attn"]
        if "u" in sa["q"]:  # low-rank: separate factors, no fusion
            fused.append(None)
            continue
        b = jnp.concatenate([sa["q"]["b"], sa["k"]["b"], sa["v"]["b"]])
        if "q8" in sa["q"]:
            # int8 PTQ: per-output-channel scales concatenate alongside
            # the int8 columns, so the fused projection stays int8 in
            # HBM (models/quantize.py; layers.dense dequantizes).
            q8 = jnp.concatenate(
                [sa["q"]["q8"], sa["k"]["q8"], sa["v"]["q8"]], axis=1)
            s = jnp.concatenate(
                [sa["q"]["scale"], sa["k"]["scale"], sa["v"]["scale"]])
            fused.append({"q8": q8, "scale": s, "b": b})
            continue
        if "w" not in sa["q"]:
            fused.append(None)
            continue
        w = jnp.concatenate([sa["q"]["w"], sa["k"]["w"], sa["v"]["w"]],
                            axis=1).astype(dtype)
        fused.append({"w": w, "b": b})
    return fused


def init_cache(p: Params, enc_out: jnp.ndarray, max_len: int,
               num_heads: int, dim_key: int, dim_value: int,
               dtype=jnp.bfloat16, beam_W: Optional[int] = None
               ) -> List[Dict[str, jnp.ndarray]]:
    """Precompute per-layer cross K/V from encoder output, fused self-attn
    QKV weights, and allocate self-attention K/V rings.
    enc_out: (B, T_enc, H).

    beam_W: beam layouts — self K/V (B, nh, W, L, d) slot-local rings and
    cross K/V (B, nh, T, d) shared per utterance (enc_out here is the
    UNREPLICATED (B_utt, T, H)); see _attend_beam/_attend_cross_beam."""
    B = enc_out.shape[0]
    T_enc = enc_out.shape[1]
    fused = fused_qkv_weights(p, dtype)
    cache = []
    for lp, wqkv in zip(p["layers"], fused):
        k_cross = L.dense(lp["enc_attn"]["k"], enc_out, dtype).reshape(
            B, T_enc, num_heads, dim_key)
        v_cross = L.dense(lp["enc_attn"]["v"], enc_out, dtype).reshape(
            B, T_enc, num_heads, dim_value)
        if beam_W:
            entry = {
                "k_self": jnp.zeros(
                    (B, num_heads, beam_W, max_len, dim_key), dtype),
                "v_self": jnp.zeros(
                    (B, num_heads, beam_W, max_len, dim_value), dtype),
                "k_cross": k_cross.transpose(0, 2, 1, 3),  # (B,nh,T,dk)
                "v_cross": v_cross.transpose(0, 2, 1, 3),
            }
        else:
            entry = {
                "k_self": jnp.zeros((B, max_len, num_heads, dim_key),
                                    dtype),
                "v_self": jnp.zeros((B, max_len, num_heads, dim_value),
                                    dtype),
                "k_cross": k_cross,
                "v_cross": v_cross,
            }
        if wqkv is not None:
            entry["wqkv"] = wqkv
        cache.append(entry)
    return cache


def _attend(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
            dim_key: int, valid: Optional[jnp.ndarray]) -> jnp.ndarray:
    """q: (B, nh, dk); k/v: (B, Tk, nh, d); valid: (B, Tk) bool or None."""
    scale = 1.0 / math.sqrt(dim_key)
    attn = jnp.einsum("bhd,bkhd->bhk", q, k).astype(jnp.float32) * scale
    if valid is not None:
        attn = jnp.where(valid[:, None, :], attn, -jnp.inf)
    attn = jax.nn.softmax(attn, axis=-1)
    return jnp.einsum("bhk,bkhd->bhd", attn.astype(k.dtype), v
                      ).astype(jnp.float32)


def _attend_beam(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                 dim_key: int, t: jnp.ndarray, W: int,
                 anc_hot: jnp.ndarray) -> jnp.ndarray:
    """Beam self-attention over SLOT-LOCAL caches via an ancestry table —
    the cache is never reordered (the per-step permutation copy was ~60%
    of beam time; ROADMAP Perf #2).

    The key/value the w-th beam row needs at position l lives at slot
    anc[w, l] (the slot its ancestor occupied when position l was
    written). Scores against ALL W slots are computed (tiny extra MXU
    FLOPs, zero extra HBM reads) and the ancestor's selected with a
    one-hot contraction — mathematically identical to attending over the
    reorder-materialized cache.

    Layouts are chosen so (a) every einsum maps to a transpose-free
    dot_general over the BIG operands, and (b) every multi-MB
    intermediate has the POSITION axis l minor — a minor axis of W=8
    would be lane-padded to 128 by the TPU tiler, a measured 16× HBM
    blowup (~79 MB/layer/step) that dominated the whole search.
      q: (B·W, nh, dk); k: (B, nh, W, L, dk); v: (B, nh, W, L, dv);
      anc_hot: (B, W, W_slots, L) indicator of the ancestry slots
      (entries at l > t may be arbitrary — the causal mask hides them).
    """
    scale = 1.0 / math.sqrt(dim_key)
    B, nh = k.shape[0], k.shape[1]
    L = k.shape[3]
    dk, dv = k.shape[-1], v.shape[-1]
    qs = q.reshape(B, W, nh, dk).transpose(0, 2, 1, 3)  # (B, nh, W, dk)
    # all-slot scores, then pick each row's ancestor slot per position
    s_all = jnp.einsum("bhwd,bhvld->bhwvl", qs, k).astype(jnp.float32)
    s = jnp.einsum("bhwvl,bwvl->bhwl", s_all, anc_hot) * scale
    causal = jnp.arange(L)[None, None, None, :] <= t
    s = jnp.where(causal, s, -jnp.inf)
    p = jax.nn.softmax(s, axis=-1)  # (B, nh, W, L)
    # scatter the probabilities back onto slots and contract with V
    pv = jnp.einsum("bhwl,bwvl->bhwvl", p, anc_hot).astype(v.dtype)
    out = jnp.einsum("bhwvl,bhvld->bhwd", pv, v).astype(jnp.float32)
    return out.transpose(0, 2, 1, 3).reshape(B * W, nh, dv)


def _attend_cross_beam(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                       dim_key: int, W: int) -> jnp.ndarray:
    """Beam cross-attention against PER-UTTERANCE K/V (the reference's
    beams all attend to the same encoder output — replicating cross K/V
    W× only multiplied HBM reads). q: (B·W, nh, dk);
    k: (B, nh, T, dk); v: (B, nh, T, dv)."""
    scale = 1.0 / math.sqrt(dim_key)
    B, nh = k.shape[0], k.shape[1]
    dk, dv = k.shape[-1], v.shape[-1]
    qs = q.reshape(B, W, nh, dk).transpose(0, 2, 1, 3)  # (B, nh, W, dk)
    s = jnp.einsum("bhwd,bhtd->bhwt", qs, k).astype(jnp.float32) * scale
    p = jax.nn.softmax(s, axis=-1)
    out = jnp.einsum("bhwt,bhtd->bhwd", p.astype(v.dtype), v
                     ).astype(jnp.float32)
    return out.transpose(0, 2, 1, 3).reshape(B * W, nh, dv)


def decode_step(p: Params, cache, token: jnp.ndarray, t: jnp.ndarray,
                num_heads: int, dim_key: int, dim_value: int,
                dim_model: int, emb_trg_sharing: bool = False,
                dtype=jnp.bfloat16, beam: Optional[Tuple] = None):
    """One decode step. token: (B,) int32 ids at position t (scalar traced).
    Returns (logits (B, V), new_cache). Inference semantics: non-pad mask 1,
    no cross mask, dropout off (transformer.py:336-348).

    beam=(W, anc_hot) switches self-attention to the slot-local ancestry
    formulation (_attend_beam): rows are B_utt·W beam slots and the cache
    is never permuted between steps."""
    B = token.shape[0]
    scale = logit_scale(dim_model, emb_trg_sharing)
    x = p["embedding"][token] * scale + p["pe"][t]  # (B, H)

    nk = num_heads * dim_key
    new_cache = []
    for lp, c in zip(p["layers"], cache):
        residual = x
        sa = lp["self_attn"]
        if "wqkv" in c:
            qkv = L.dense(c["wqkv"], x, dtype)  # (B, 2*nk + nh*dv)
            q = qkv[:, :nk].reshape(B, num_heads, dim_key)
            k_t = qkv[:, nk:2 * nk].reshape(B, num_heads, dim_key)
            v_t = qkv[:, 2 * nk:].reshape(B, num_heads, dim_value)
        else:
            q = L.dense(sa["q"], x, dtype).reshape(B, num_heads, dim_key)
            k_t = L.dense(sa["k"], x, dtype).reshape(B, num_heads, dim_key)
            v_t = L.dense(sa["v"], x, dtype).reshape(B, num_heads, dim_value)
        if beam is not None:
            W, anc_hot = beam
            Bu = B // W
            # slot-local writes in the (B, nh, W, L, d) beam layout.
            # The write is a masked select rather than dynamic_update_slice:
            # XLA staged these carries in alternate memory and lowered the
            # dus as a full-buffer shuttle (~0.16 ms per cache per step,
            # 62% of beam time); the select fuses into one elementwise pass.
            k_b = k_t.reshape(Bu, W, num_heads, dim_key
                              ).transpose(0, 2, 1, 3)
            v_b = v_t.reshape(Bu, W, num_heads, dim_value
                              ).transpose(0, 2, 1, 3)
            L_len = c["k_self"].shape[3]
            at_t = (jnp.arange(L_len) == t)[None, None, None, :, None]
            k_self = jnp.where(at_t, k_b[:, :, :, None, :], c["k_self"])
            v_self = jnp.where(at_t, v_b[:, :, :, None, :], c["v_self"])
            out = _attend_beam(q, k_self, v_self, dim_key, t, W, anc_hot)
        else:
            # dynamic_update stays for the single-row cache: it lowers
            # in-place here (a masked-select rewrite measured SLOWER —
            # the small greedy caches are not staged in alternate memory)
            k_self = jax.lax.dynamic_update_index_in_dim(
                c["k_self"], k_t, t, 1)
            v_self = jax.lax.dynamic_update_index_in_dim(
                c["v_self"], v_t, t, 1)
            valid = (jnp.arange(k_self.shape[1])[None, :] <= t)
            valid = jnp.broadcast_to(valid, (B, k_self.shape[1]))
            out = _attend(q, k_self, v_self, dim_key, valid)
        out = out.reshape(B, num_heads * dim_value)
        out = L.dense(sa["out"], out.astype(dtype), dtype).astype(jnp.float32)
        x = L.layer_norm(sa["ln"], out + residual)

        residual = x
        ea = lp["enc_attn"]
        q = L.dense(ea["q"], x, dtype).reshape(B, num_heads, dim_key)
        if beam is not None:
            out = _attend_cross_beam(q, c["k_cross"], c["v_cross"],
                                     dim_key, beam[0])
        else:
            out = _attend(q, c["k_cross"], c["v_cross"], dim_key, None)
        out = out.reshape(B, num_heads * dim_value)
        out = L.dense(ea["out"], out.astype(dtype), dtype).astype(jnp.float32)
        x = L.layer_norm(ea["ln"], out + residual)

        residual = x
        fp = lp["ffn"]
        h = jax.nn.relu(L.dense(fp["w1"], x, dtype))
        h = L.dense(fp["w2"], h, dtype).astype(jnp.float32)
        x = L.layer_norm(fp["ln"], h + residual)

        new_cache.append({**c, "k_self": k_self, "v_self": v_self})

    logits = output_logits(p, x, dtype)  # (B, V)
    return logits, new_cache
