"""Batch evaluation (the reference's test.py:19-62 evaluate()).

Decodes every batch (greedy or beam), strips special chars, accumulates
CER / WER / CER_EN / CER_ZH totals.
"""

from __future__ import annotations

import logging
from typing import Dict

import numpy as np

from end2end_asr_tpu.config import Config, EOS_CHAR, PAD_CHAR, SOS_CHAR
from end2end_asr_tpu.decoding.greedy import (greedy_decode_progressive,
                                             ids_to_strings)
from end2end_asr_tpu.models.transformer import dims_from_config
from end2end_asr_tpu.training.steps import make_encode_fn
from end2end_asr_tpu.training.trainer import ids_to_string_until_pad
from end2end_asr_tpu.utils.metrics import (calculate_cer, calculate_cer_en_zh,
                                           calculate_wer)

logger = logging.getLogger("end2end_asr_tpu")


def _strip(s: str) -> str:
    return (s.replace(EOS_CHAR, "").replace(SOS_CHAR, "")
            .replace(PAD_CHAR, ""))


def evaluate(params, model_state, cfg: Config, test_loader,
             id2label: Dict[int, str], lm=None,
             verbose: bool = False, mesh=None) -> Dict[str, float]:
    """Batch evaluation; under a mesh the encode/decode programs run SPMD
    with the batch sharded on the data axis (params replicated)."""
    import jax

    dims = dims_from_config(cfg)
    encode_fn = None
    beam = None
    if cfg.beam_search or (cfg.lm_rescoring and cfg.lm_greedy_as_beam
                           and lm is not None):
        # Reference-reachable semantics for --lm-rescoring WITHOUT
        # --beam-search: the LM is ignored — evaluate() always calls
        # greedy_search with defaults (transformer.py:117-118), and the
        # per-step LM branch it never reaches is broken code (:357-373,
        # softmax/topk over the time dim; pinned crashing by
        # test_decode_parity.py). Default = that parity. The opt-in
        # --lm-greedy-as-beam upgrade maps the intent to a width-k
        # rescored beam instead.
        from end2end_asr_tpu.decoding.beam import BeamDecoder
        beam = BeamDecoder(cfg, dims, id2label, lm=lm,
                           stage_len=cfg.decode_stage_len)
    elif cfg.lm_rescoring and not cfg.beam_search:
        logger.warning(
            "--lm-rescoring without --beam-search: the LM is unused, "
            "matching the reference's reachable behavior "
            "(transformer.py:117-118); pass --lm-greedy-as-beam for a "
            "width-%d LM-rescored beam instead", cfg.beam_width)

    if mesh is not None:
        from end2end_asr_tpu.parallel.mesh import batch_sharded, replicated
        from end2end_asr_tpu.parallel.tp import (mesh_model_size,
                                                 shard_params)
        rep = replicated(mesh)
        if mesh_model_size(mesh) > 1:
            # tensor-parallel inference (parallel/tp.py): column/row
            # shardings on the model axis; batch_sharded specs below
            # replicate over it (P('data', ...))
            params = shard_params(mesh, params)
        else:
            params = jax.tree_util.tree_map(
                lambda x: jax.device_put(x, rep), params)
        if model_state:
            model_state = jax.tree_util.tree_map(
                lambda x: jax.device_put(x, rep), model_state)

    totals = dict(word=0, char=0, cer=0, wer=0,
                  en_cer=0, zh_cer=0, en_char=0, zh_char=0)

    for batch in test_loader:
        from_pcm = batch.pcm is not None
        if encode_fn is None:
            encode_fn = make_encode_fn(cfg, dims, from_pcm)
        arr = batch.pcm if from_pcm else batch.spect
        n_frames = batch.n_frames
        if mesh is not None:
            import numpy as _np
            arr = jax.device_put(arr, batch_sharded(mesh, _np.ndim(arr)))
            n_frames = jax.device_put(n_frames, batch_sharded(mesh, 1))
        enc_out, enc_lens = encode_fn(params, model_state, arr, n_frames,
                                      spect_T=batch.src_bucket)
        # raw strings here; the scoring loop below owns the special-char
        # stripping for hyp and gold alike
        golds = [ids_to_string_until_pad(row, id2label)
                 for row in np.asarray(batch.targets)]

        if beam is not None:
            hyps = beam.decode(params, enc_out)
        else:
            max_len = min(cfg.decode_max_len, cfg.tgt_max_len)
            ids = greedy_decode_progressive(
                params, enc_out, dims, max_len=max_len,
                stage_len=cfg.decode_stage_len or max_len)
            hyps = ids_to_strings(ids, id2label)

        if batch.real_rows > 0:
            # drop the loader's cycled-padding rows (mesh divisibility,
            # loader.pad_to_full) from the scored set
            hyps, golds = hyps[:batch.real_rows], golds[:batch.real_rows]

        for hyp_raw, gold_raw in zip(hyps, golds):
            hyp, gold = _strip(hyp_raw), _strip(gold_raw)
            if verbose:
                logger.info("HYP: %s || GOLD: %s", hyp, gold)
            totals["wer"] += calculate_wer(hyp, gold)
            totals["cer"] += calculate_cer(hyp.strip(), gold.strip())
            en_cer, zh_cer, n_en, n_zh = calculate_cer_en_zh(hyp, gold)
            totals["en_cer"] += en_cer
            totals["zh_cer"] += zh_cer
            totals["en_char"] += n_en
            totals["zh_char"] += n_zh
            totals["word"] += len(gold.split(" "))
            totals["char"] += len(gold)

        logger.info(
            "TEST CER:%.2f%% WER:%.2f%% CER_EN:%.2f%% CER_ZH:%.2f%%",
            totals["cer"] * 100 / max(1, totals["char"]),
            totals["wer"] * 100 / max(1, totals["word"]),
            totals["en_cer"] * 100 / max(1, totals["en_char"]),
            totals["zh_cer"] * 100 / max(1, totals["zh_char"]))

    return {
        "cer": totals["cer"] * 100 / max(1, totals["char"]),
        "wer": totals["wer"] * 100 / max(1, totals["word"]),
        "cer_en": totals["en_cer"] * 100 / max(1, totals["en_char"]),
        "cer_zh": totals["zh_cer"] * 100 / max(1, totals["zh_char"]),
    }
