"""Batched beam search, compiled.

Reference: Decoder.beam_search (models/asr/transformer.py:396-517) — a
per-utterance Python loop over dict hypotheses that re-runs the decoder
over the whole prefix for EVERY hypothesis at EVERY step. Here the beam
dimension is folded into the batch ((B, W) → B·W rows), each step is one
KV-cached decode_step, and the whole search is a single `lax.scan`.

Semantics preserved:
  * expansion: each alive hypothesis proposes top-W tokens; keep the best
    W by cumulative log-prob (transformer.py:445-462);
  * a hypothesis whose chosen token is EOS retires to a finished pool and
    is NOT refilled (the reference's shrinking hyps list, :469-492);
  * at step enc_T - 1 every still-alive hypothesis gets EOS appended
    WITHOUT adding its log-prob (:464-467);
  * final ranking happens on host with the reference's exact formula
    final = score + sqrt(num_words)·c_weight
    (+ lm_weight·lm_score − 2·oov when LM-rescoring, :473-488) over the
    finished pool; the pool keeps the best `POOL_FACTOR·W` finished
    hypotheses by raw score (the reference keeps all — in practice the
    eventual winner is always near the top by raw score; cap documented);
  * empty pool for an utterance → greedy fallback (the reference falls
    back to greedy for the whole batch on count mismatch,
    transformer.py:114-116; here the fallback is per-utterance).
"""

from __future__ import annotations

import functools
import math
from typing import Dict, List, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from end2end_asr_tpu.config import Config, EOS_TOKEN, SOS_TOKEN
from end2end_asr_tpu.models import decoder as D
from end2end_asr_tpu.models.transformer import ModelDims
from end2end_asr_tpu.decoding.greedy import greedy_decode, ids_to_strings

NEG = -1.0e30
POOL_FACTOR = 4
# auto-exact pool: when the exact pool (pool_factor = n_steps+1, which
# provably keeps EVERY finished hypothesis — at most W retire per step
# plus W forced-EOS) costs at most this many token-table elements
# (P·L = (n+1)·W·(n+2)), use it instead of the POOL_FACTOR cap. At W=8
# this makes every search up to ~120 steps exact — covering the
# progressive stage-1 pass and typical utterances — while long searches
# keep the documented cap (the per-step pool merge is O(P²+P·L)).
AUTO_EXACT_POOL_ELEMS = 1 << 17


@functools.partial(jax.jit,
                   static_argnames=("dims", "W", "n_steps", "force_eos",
                                    "pool_factor"))
def beam_search_device(params: Dict, enc_out: jnp.ndarray, dims: ModelDims,
                       W: int, n_steps: int, force_eos: bool,
                       pool_factor: int = POOL_FACTOR):
    """Returns (pool_tokens (B,P,L), pool_scores (B,P), pool_lens (B,P),
    unfinished (B,) bool — True when the step cap was hit with alive
    hypotheses remaining, i.e. the pool may be incomplete vs a longer run).

    L = n_steps + 2 (SOS + n_steps tokens + forced EOS slot). Invalid pool
    entries have score <= NEG/2. `pool_factor` bounds the finished pool at
    pool_factor·W entries by raw score (the reference keeps ALL finished
    hypotheses; pool_factor >= n_steps + 1 makes this exact since at most
    W retire per step).
    """
    B, T_enc, H = enc_out.shape
    dec = params["decoder"]
    P = pool_factor * W
    L = n_steps + 2

    # cross K/V are computed once per UTTERANCE (beams share them) and
    # self K/V rings are slot-local in beam layout — see decoder.init_cache
    cache = D.init_cache(dec, enc_out, L, dims.num_heads, dims.dim_key,
                         dims.dim_value, dtype=dims.dtype, beam_W=W)

    tokens = jnp.full((B, W, L), EOS_TOKEN, jnp.int32)
    tokens = tokens.at[:, :, 0].set(SOS_TOKEN)
    scores = jnp.full((B, W), NEG, jnp.float32).at[:, 0].set(0.0)
    alive = jnp.zeros((B, W), bool).at[:, 0].set(True)
    # ancestry table: the self-K/V a row needs at position l lives at
    # slot anc[b, w, l]; caches stay slot-local and are NEVER permuted
    # (the per-step reorder copy was ~60% of beam time)
    anc = jnp.zeros((B, W, L), jnp.int32)

    pool_tokens = jnp.full((B, P, L), EOS_TOKEN, jnp.int32)
    pool_scores = jnp.full((B, P), NEG, jnp.float32)
    pool_lens = jnp.zeros((B, P), jnp.int32)

    def insert_pool(pool_t, pool_s, pool_l, new_t, new_s, new_l):
        """Merge W candidates into the per-utterance top-P pool.

        The row gather is a one-hot MATMUL: a vmapped t[i] gather of
        ~(P+W)·B small rows per step ran at ~1.9 ms/step on v5e (scattered
        sub-lane DMAs dominated the whole search); the one-hot contraction
        streams the same bytes through the MXU and is exact (token ids
        < 2^24 are representable in f32)."""
        all_t = jnp.concatenate([pool_t, new_t], axis=1)  # (B, P+W, L)
        all_s = jnp.concatenate([pool_s, new_s], axis=1)
        all_l = jnp.concatenate([pool_l, new_l], axis=1)
        top_s, top_i = jax.lax.top_k(all_s, P)
        sel = jax.nn.one_hot(top_i, P + W, dtype=jnp.float32)  # (B,P,P+W)
        # precision=HIGHEST is load-bearing: TPU DEFAULT-precision dots
        # round f32 operands to bf16, which is integer-exact only to
        # 2^8 — AiShell token ids (~4k vocab) and pool lengths > 255
        # would come back corrupted. HIGHEST keeps f32-exact ids
        # (< 2^24) at negligible cost on these tiny contractions.
        hi = jax.lax.Precision.HIGHEST
        t_sel = jnp.einsum("bpq,bql->bpl", sel,
                           all_t.astype(jnp.float32),
                           precision=hi).astype(jnp.int32)
        l_sel = jnp.einsum("bpq,bq->bp", sel,
                           all_l.astype(jnp.float32),
                           precision=hi).astype(jnp.int32)
        return t_sel, top_s, l_sel

    def step(carry):
        (t, tokens, scores, alive, anc, cache, pool_t, pool_s,
         pool_l) = carry
        last = tokens[:, :, t].reshape(B * W)
        # position t is being written by each slot for itself
        anc = anc.at[:, :, t].set(jnp.arange(W)[None, :])
        # indicator in (B, W, slots, L) order — position axis minor, so
        # nothing downstream lane-pads the W=8 axis (see _attend_beam)
        anc_hot = (anc[:, :, None, :] ==
                   jnp.arange(W)[None, None, :, None]).astype(jnp.float32)
        logits, cache = D.decode_step(
            dec, cache, last, t, dims.num_heads, dims.dim_key,
            dims.dim_value, dims.dim_model,
            emb_trg_sharing=dims.emb_trg_sharing, dtype=dims.dtype,
            beam=(W, anc_hot))
        V = logits.shape[-1]
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        logp = logp.reshape(B, W, V)

        cand = jnp.where(alive[:, :, None], scores[:, :, None] + logp, NEG)
        top_s, top_i = jax.lax.top_k(cand.reshape(B, W * V), W)  # (B, W)
        parent = top_i // V
        tok = (top_i % V).astype(jnp.int32)

        # gather parent prefixes + ancestry (tiny int32 tables — the
        # self-K/V caches are slot-local and never move)
        take_rows = jax.vmap(lambda x, i: x[i])
        new_tokens = take_rows(tokens, parent)  # (B, W, L)
        new_tokens = new_tokens.at[:, :, t + 1].set(tok)
        new_anc = take_rows(anc, parent)

        parent_alive = take_rows(alive, parent)
        valid = parent_alive & (top_s > NEG / 2)
        ended = valid & (tok == EOS_TOKEN)
        new_alive = valid & ~ended

        end_s = jnp.where(ended, top_s, NEG)
        end_l = jnp.full((B, W), t + 2, jnp.int32)
        pool_t, pool_s, pool_l = insert_pool(
            pool_t, pool_s, pool_l, new_tokens, end_s, end_l)

        new_scores = jnp.where(new_alive, top_s, NEG)
        return (t + 1, new_tokens, new_scores, new_alive, new_anc, cache,
                pool_t, pool_s, pool_l)

    def cond(carry):
        # early exit once every hypothesis has retired (the reference
        # breaks its Python loop the same way, transformer.py:494-496)
        t = carry[0]
        alive = carry[3]
        return (t < n_steps) & jnp.any(alive)

    carry = (jnp.int32(0), tokens, scores, alive, anc, cache, pool_tokens,
             pool_scores, pool_lens)
    carry = jax.lax.while_loop(cond, step, carry)
    (_, tokens, scores, alive, anc, cache, pool_t, pool_s,
     pool_l) = carry
    unfinished = jnp.any(alive, axis=1)

    if force_eos:
        # transformer.py:464-467: surviving hyps get EOS appended (no
        # added log-prob) and retire
        forced_t = tokens.at[:, :, n_steps + 1].set(EOS_TOKEN)
        forced_s = jnp.where(alive, scores, NEG)
        forced_l = jnp.full((B, W), n_steps + 2, jnp.int32)
        pool_t, pool_s, pool_l = insert_pool(
            pool_t, pool_s, pool_l, forced_t, forced_s, forced_l)

    return pool_t, pool_s, pool_l, unfinished


class Hyp(NamedTuple):
    """One n-best entry: token ids (SOS…EOS), decoded string (yseq[1:],
    specials included, like post_process_hyp transformer.py:307-314),
    final rank score, and raw cumulative log-prob."""
    ids: List[int]
    text: str
    final: float
    raw: float


class BeamDecoder:
    """Host wrapper: device beam → host final scoring/LM rescoring/nbest."""

    def __init__(self, cfg: Config, dims: ModelDims,
                 id2label: Dict[int, str], lm=None,
                 pool_factor: int = POOL_FACTOR, stage_len: int = 64,
                 auto_exact: bool = True):
        self.cfg = cfg
        self.dims = dims
        self.id2label = id2label
        self.lm = lm
        self.pool_factor = pool_factor
        # short-cache first stage for decode_nbest (0 disables)
        self.stage_len = stage_len
        # raise the pool to provably-exact when cheap (tests disable
        # this to stress the capped pool against the exact one)
        self.auto_exact = auto_exact

    def _pool_factor_for(self, W: int, n_steps: int) -> int:
        """Effective pool factor for a search of n_steps: exact
        (n_steps+1) when the caller's factor already covers it (capping
        saves memory with identical results) or when auto-exact deems it
        cheap; the configured cap otherwise."""
        exact = n_steps + 1
        if self.pool_factor >= exact:
            return exact
        if (self.auto_exact
                and exact * W * (n_steps + 2) <= AUTO_EXACT_POOL_ELEMS):
            return exact
        return self.pool_factor

    def _final_score(self, ids: np.ndarray, raw_score: float,
                     length: int) -> Tuple[float, str]:
        """transformer.py:473-488 exactly: strip specials, collapse double
        spaces, word-count bonus, optional LM rescoring."""
        from end2end_asr_tpu.config import EOS_CHAR, PAD_CHAR, SOS_CHAR
        chars = "".join(self.id2label.get(int(x), "")
                        for x in ids[:length])
        seq_str = (chars.replace(PAD_CHAR, "").replace(SOS_CHAR, "")
                   .replace(EOS_CHAR, "")).replace("  ", " ")
        num_words = len(seq_str.split())
        if self.lm is not None and self.cfg.lm_rescoring:
            from end2end_asr_tpu.decoding.lm_rescoring import calculate_lm_score
            lm_score, lm_num_words, oov = calculate_lm_score(
                ids[:length], self.lm, self.id2label)
            lm_score -= oov * 2
            final = (raw_score + self.cfg.lm_weight * lm_score
                     + math.sqrt(lm_num_words) * self.cfg.c_weight)
        else:
            final = raw_score + math.sqrt(num_words) * self.cfg.c_weight
        return final, seq_str

    def decode_nbest(self, params, enc_out, nbest: Optional[int] = None
                     ) -> List[List[Hyp]]:
        """Returns, per utterance, up to nbest `Hyp` entries ranked by
        final score (transformer.py:498-517)."""
        cfg = self.cfg
        nbest = nbest or 1
        B, T_enc = enc_out.shape[0], enc_out.shape[1]
        # tgt_max_len bounds the positional table (decoder.py pe)
        n_steps = min(cfg.decode_max_len, T_enc, cfg.tgt_max_len - 1)
        force = T_enc <= cfg.decode_max_len
        # exact two-stage search: per-step cost scales with the KV cache
        # length, so run with a short cache first; if any utterance still
        # had alive hypotheses at the short cap (rare at the reference's
        # typical 20-50 step outputs), re-run everything at full length.
        # Stage 1 is exact when it suffices: cache length is numerically
        # inert and a search whose beams all retired before the cap has
        # the same finished pool at any longer length.
        pool_t = pool_s = pool_l = None
        if self.stage_len and self.stage_len < n_steps:
            pool_t, pool_s, pool_l, unfin = beam_search_device(
                params, enc_out, self.dims, cfg.beam_width,
                self.stage_len, False,
                pool_factor=self._pool_factor_for(cfg.beam_width,
                                                  self.stage_len))
            if bool(np.any(np.asarray(unfin))):
                pool_t = None
        if pool_t is None:
            pool_t, pool_s, pool_l, _ = beam_search_device(
                params, enc_out, self.dims, cfg.beam_width, n_steps, force,
                pool_factor=self._pool_factor_for(cfg.beam_width,
                                                  n_steps))
        pool_t = np.asarray(pool_t)
        pool_s = np.asarray(pool_s)
        pool_l = np.asarray(pool_l)

        results: List[List[Hyp]] = []
        need_greedy = []
        for b in range(B):
            cands = []
            for p in range(pool_t.shape[1]):
                if pool_s[b, p] <= NEG / 2:
                    continue
                final, _ = self._final_score(pool_t[b, p],
                                             float(pool_s[b, p]),
                                             int(pool_l[b, p]))
                cands.append((final, p))
            cands.sort(reverse=True)
            utt = []
            for final, p in cands[:nbest]:
                ids = pool_t[b, p, :int(pool_l[b, p])].tolist()
                s = "".join(self.id2label.get(int(x), "") for x in ids[1:])
                utt.append(Hyp(ids, s, final, float(pool_s[b, p])))
            results.append(utt)
            if not utt:
                need_greedy.append(b)

        if need_greedy:
            # greedy fallback (reference: transformer.py:114-116)
            ids = greedy_decode(params, enc_out, self.dims,
                                max_len=min(cfg.decode_max_len,
                                            cfg.tgt_max_len))
            strs = ids_to_strings(ids, self.id2label)
            ids = np.asarray(ids)
            for b in need_greedy:
                # match the beam Hyps' yseq convention: leading SOS,
                # trimmed to the first EOS inclusive (no trailing pad)
                row = ids[b].tolist()
                cut = (row.index(EOS_TOKEN) + 1 if EOS_TOKEN in row
                       else len(row))
                results[b] = [Hyp([SOS_TOKEN] + row[:cut], strs[b],
                                  float("-inf"), float("-inf"))]
        return results

    def decode(self, params, enc_out) -> List[str]:
        """1-best strings per utterance."""
        return [utt[0].text if utt else ""
                for utt in self.decode_nbest(params, enc_out, nbest=1)]
