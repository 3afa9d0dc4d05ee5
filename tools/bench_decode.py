#!/usr/bin/env python3
"""Decode throughput benchmark (BASELINE.json secondary metric: decode
RTF + CER at beam=8).

Measures greedy and beam-8 decoding on the flagship AiShell config over a
synthetic batch of ~8s utterances and reports RTFx (audio seconds decoded
per wall second; higher is better, >1 = faster than realtime).

The reference decodes with a Python loop that re-runs the full decoder
prefix per step (and per hypothesis, per utterance, for beam) — here both
searches are single compiled lax.scan programs with KV caches.
"""

import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=800,
                    help="source bucket (800 = flagship; 2400/4000 "
                         "validate the long-bucket decode paths)")
    ap.add_argument("--quantize", action="store_true",
                    help="int8 weight-only PTQ (models/quantize.py) "
                         "before decoding — the --quantize-int8 serving "
                         "path")
    args = ap.parse_args()

    from end2end_asr_tpu.utils.platform import honor_env_platform
    honor_env_platform()  # JAX_PLATFORMS=cpu smoke runs stay on CPU

    import jax

    from __graft_entry__ import _flagship_cfg, _synthetic_batch
    from end2end_asr_tpu.decoding.beam import beam_search_device
    from end2end_asr_tpu.decoding.greedy import greedy_decode
    from end2end_asr_tpu.models.transformer import (dims_from_config,
                                                    init_transformer)
    from end2end_asr_tpu.training.steps import make_encode_fn

    BATCH, T_FRAMES, VOCAB = 12, args.frames, 4336
    AUDIO_SECONDS = BATCH * T_FRAMES * 0.01  # 10 ms hop
    cfg = _flagship_cfg().replace(batch_size=BATCH, beam_width=8)
    dims = dims_from_config(cfg)
    params, state = jax.jit(functools.partial(
        init_transformer, cfg=cfg, num_vocab=VOCAB))(jax.random.PRNGKey(0))
    pcm, n_frames, _, _ = _synthetic_batch(cfg, BATCH, T_FRAMES, 8)
    if args.quantize:
        from end2end_asr_tpu.models.quantize import quantize_for_inference
        params = quantize_for_inference(params)

    encode_fn = make_encode_fn(cfg, dims, from_pcm=True)
    enc_out, _ = encode_fn(params, state, pcm, n_frames, spect_T=T_FRAMES)
    # NOTE: jax.block_until_ready does not block through this image's
    # remote-TPU tunnel; sync via host reads of the results.
    np.asarray(enc_out[:1, :1, :1])
    results = {}
    # greedy: 300 steps (reference cap)
    ids = greedy_decode(params, enc_out, dims, max_len=300)
    _ = np.asarray(ids)
    t0 = time.time()
    N = 5
    for _ in range(N):
        ids = greedy_decode(params, enc_out, dims, max_len=300)
        _ = np.asarray(ids)
    dt = (time.time() - t0) / N
    results["greedy_rtf_x"] = round(AUDIO_SECONDS / dt, 1)
    results["greedy_batch_ms"] = round(dt * 1000, 1)

    # typical-length operating point: a TRAINED AiShell model emits EOS
    # after ~15-25 tokens and the while_loop early-exits; the per-step
    # cost is length-linear, so a capped run measures the same program a
    # trained model executes (the uncapped numbers above are worst-case)
    ids = greedy_decode(params, enc_out, dims, max_len=24)
    _ = np.asarray(ids)
    t0 = time.time()
    for _ in range(N):
        ids = greedy_decode(params, enc_out, dims, max_len=24)
        _ = np.asarray(ids)
    dt = (time.time() - t0) / N
    results["greedy_rtf_x_typical24"] = round(AUDIO_SECONDS / dt, 1)
    results["greedy_batch_ms_typical24"] = round(dt * 1000, 1)

    # beam 8: n_steps = min(300, enc_T=200) → forced EOS at 199
    enc_T = enc_out.shape[1]
    n_steps = min(cfg.decode_max_len, enc_T)
    force = enc_T <= cfg.decode_max_len
    out = beam_search_device(params, enc_out, dims, 8, n_steps, force)
    _ = np.asarray(out[1])
    t0 = time.time()
    for _ in range(N):
        out = beam_search_device(params, enc_out, dims, 8, n_steps, force)
        _ = np.asarray(out[1])
    dt = (time.time() - t0) / N
    results["beam8_rtf_x"] = round(AUDIO_SECONDS / dt, 1)
    results["beam8_batch_ms"] = round(dt * 1000, 1)

    out = beam_search_device(params, enc_out, dims, 8, 32, False)
    _ = np.asarray(out[1])
    t0 = time.time()
    for _ in range(N):
        out = beam_search_device(params, enc_out, dims, 8, 32, False)
        _ = np.asarray(out[1])
    dt = (time.time() - t0) / N
    results["beam8_rtf_x_typical32"] = round(AUDIO_SECONDS / dt, 1)
    results["beam8_batch_ms_typical32"] = round(dt * 1000, 1)

    # progressive stage-1 (the production default: evaluation.py and
    # BeamDecoder run a 64-step short-cache pass first and only re-run
    # long utterances at full length; on trained models stage 1 almost
    # always suffices, so this IS the typical end-to-end cost)
    from end2end_asr_tpu.decoding.greedy import greedy_decode_progressive
    ids = greedy_decode_progressive(params, enc_out, dims, max_len=300,
                                    stage_len=64)
    _ = np.asarray(ids)
    t0 = time.time()
    for _ in range(N):
        _ = np.asarray(greedy_decode_progressive(
            params, enc_out, dims, max_len=300, stage_len=64))
    dt = (time.time() - t0) / N
    # random weights rarely all-EOS within 64 -> this usually measures
    # the WORST progressive case (stage1 + full rerun); still reported
    results["greedy_progressive_batch_ms"] = round(dt * 1000, 1)

    out = beam_search_device(params, enc_out, dims, 8, 64, False)
    _ = np.asarray(out[1])
    t0 = time.time()
    for _ in range(N):
        out = beam_search_device(params, enc_out, dims, 8, 64, False)
        _ = np.asarray(out[1])
    dt = (time.time() - t0) / N
    results["beam8_stage64_batch_ms"] = round(dt * 1000, 1)
    results["audio_seconds_per_batch"] = AUDIO_SECONDS

    results["frames"] = T_FRAMES
    results["quantize_int8"] = bool(args.quantize)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
