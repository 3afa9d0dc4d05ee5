#!/usr/bin/env python3
"""Single-command transcription: WAV file(s) in, text out.

Convenience CLI on top of the framework (the reference only offers
batch evaluation through manifests); loads a checkpoint, runs the
on-device feature pipeline + greedy or beam decoding and prints one
line per file:  <path>\t<transcript>

Usage:
  python transcribe.py --continue-from models/run/best_model a.wav b.wav
                       [--beam-search --beam-width 8]
                       [--lm-rescoring --lm-path lm.npz]
"""

import argparse
import sys

import numpy as np

from end2end_asr_tpu.utils.platform import (enable_compilation_cache,
                                             honor_env_platform)

honor_env_platform()
enable_compilation_cache()


def main(argv=None):
    ap = argparse.ArgumentParser(description="Transcribe WAV files")
    ap.add_argument("wavs", nargs="+")
    ap.add_argument("--continue-from", required=True)
    ap.add_argument("--beam-search", action="store_true")
    ap.add_argument("--beam-width", type=int, default=8)
    ap.add_argument("--lm-rescoring", action="store_true")
    ap.add_argument("--lm-path", default="lm.npz")
    ap.add_argument("--lm-weight", type=float, default=0.1)
    ap.add_argument("--c-weight", type=float, default=0.1)
    ap.add_argument("--lm-greedy-as-beam", action="store_true",
                    help="upgrade greedy --lm-rescoring to a width-k "
                         "LM-rescored beam (see evaluation.py)")
    ap.add_argument("--quantize-int8", action="store_true",
                    help="weight-only int8 PTQ of the encoder/decoder "
                         "dense weights on load (models/quantize.py). "
                         "4x smaller weights at transcript parity; short "
                         "non-progressive greedy decodes can be SLOWER "
                         "(BENCH_NOTES.md round 4)")
    args = ap.parse_args(argv)

    from end2end_asr_tpu.data.audio import load_audio
    from end2end_asr_tpu.data.features import num_frames
    from end2end_asr_tpu.data.loader import pick_bucket
    from end2end_asr_tpu.decoding.greedy import (
        greedy_decode_progressive, ids_to_strings)
    from end2end_asr_tpu.models.transformer import dims_from_config
    from end2end_asr_tpu.ops.features import reflect_pad_pcm
    from end2end_asr_tpu.evaluation import _strip as strip_specials
    from end2end_asr_tpu.training.checkpoint import load_checkpoint
    from end2end_asr_tpu.training.steps import make_encode_fn

    (cfg, _, params, _, model_state, label2id, id2label, _
     ) = load_checkpoint(args.continue_from)
    cfg = cfg.replace(beam_search=args.beam_search,
                      beam_width=args.beam_width,
                      lm_rescoring=args.lm_rescoring,
                      lm_path=args.lm_path, lm_weight=args.lm_weight,
                      c_weight=args.c_weight,
                      lm_greedy_as_beam=args.lm_greedy_as_beam)
    if args.quantize_int8:
        from end2end_asr_tpu.models.quantize import quantize_for_inference
        params = quantize_for_inference(params)
    dims = dims_from_config(cfg)
    encode_fn = make_encode_fn(cfg, dims, from_pcm=True)

    lm = None
    if cfg.lm_rescoring:
        from end2end_asr_tpu.models.lm import LM
        lm = LM(cfg.lm_path)
    beam = None
    # mirror evaluation.py: --lm-rescoring without --beam-search ignores
    # the LM (reference transformer.py:117-118) unless --lm-greedy-as-beam
    if cfg.beam_search or (lm is not None and cfg.lm_greedy_as_beam):
        from end2end_asr_tpu.decoding.beam import BeamDecoder
        beam = BeamDecoder(cfg, dims, id2label, lm=lm,
                   stage_len=cfg.decode_stage_len)
    elif lm is not None:
        print("warning: --lm-rescoring without --beam-search leaves the "
              "LM unused (reference transformer.py:117-118); pass "
              "--lm-greedy-as-beam for an LM-rescored beam",
              file=sys.stderr)

    n_fft, hop = cfg.n_fft, cfg.hop_length
    for path in args.wavs:
        y = load_audio(path)
        frames = min(num_frames(len(y), n_fft, hop), cfg.src_max_len)
        T_b = min(pick_bucket(frames, cfg.src_buckets), cfg.src_max_len)
        frames = min(frames, T_b)  # clamp like loader._build_batch when
        # src_max_len exceeds the bucket ladder's top rung
        n_pcm = (T_b - 1) * hop
        pcm = reflect_pad_pcm(y[:n_pcm], n_fft, n_pcm)[None, :]
        enc_out, _ = encode_fn(params, model_state, pcm,
                               np.array([frames], np.int32), spect_T=T_b)
        if beam is not None:
            text = beam.decode(params, enc_out)[0]
        else:
            ids = greedy_decode_progressive(
                params, enc_out, dims,
                max_len=min(cfg.decode_max_len, cfg.tgt_max_len),
                stage_len=cfg.decode_stage_len
                or min(cfg.decode_max_len, cfg.tgt_max_len))
            text = ids_to_strings(ids, id2label)[0]
        print(f"{path}\t{strip_specials(text).strip()}")


if __name__ == "__main__":
    main()
