#!/usr/bin/env python3
"""Real-TPU streaming long-form decode demo (VERDICT r4 stretch item).

The reference can only transcribe whole files (test.py:19-62); this
framework adds StreamingTranscriber (end2end_asr_tpu/streaming.py,
CPU-tested in tests/test_streaming.py). This tool completes the serving
story ON THE REAL CHIP: a long synthetic utterance arrives in 1 s PCM
chunks and every feed() returns a partial transcript; we measure the
per-feed wall latency the way a live captioning client would see it.

What to expect (design, streaming.py docstring): the encoder is
bidirectional, so each refresh re-encodes the audio so far at the
current bucket rung — latency is a staircase over the src_buckets
ladder (200/400/800/1600/2400/4000 frames), with one compile per rung
on its first hit (reported separately as compile_ms, excluded from the
steady-state percentiles).

Usage:  python tools/bench_streaming.py [--seconds 40] [--chunk-ms 1000]
Prints ONE JSON line; fold into BENCH_NOTES.md / STREAM artifacts.
"""

import argparse
import functools
import json
import time

import numpy as np

from end2end_asr_tpu.utils.platform import honor_env_platform

honor_env_platform()

import jax  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seconds", type=float, default=40.0,
                    help="total audio length (40 s = the 4000-frame "
                         "flagship envelope at 10 ms hop)")
    ap.add_argument("--chunk-ms", type=float, default=1000.0)
    ap.add_argument("--min-new-frames", type=int, default=10)
    args = ap.parse_args()

    import sys
    sys.path.insert(0, ".")
    from __graft_entry__ import _flagship_cfg
    from end2end_asr_tpu.models.transformer import init_transformer
    from end2end_asr_tpu.streaming import StreamingTranscriber

    cfg = _flagship_cfg().replace(batch_size=1)
    num_vocab = 64
    params, state = jax.jit(functools.partial(
        init_transformer, cfg=cfg, num_vocab=num_vocab))(
            jax.random.PRNGKey(0))
    id2label = {i: chr(ord("a") + (i % 26)) for i in range(num_vocab)}
    id2label[0], id2label[1], id2label[2] = "¶", "§", "¤"

    st = StreamingTranscriber(params, state, cfg, id2label,
                              min_new_frames=args.min_new_frames)

    sr = cfg.sample_rate
    total = int(args.seconds * sr)
    chunk = int(args.chunk_ms / 1000.0 * sr)
    rng = np.random.RandomState(0)
    pcm = (rng.randn(total) * 0.1).astype(np.float32)

    # per-feed wall latency; the first feed that lands on a NEW bucket
    # rung compiles that rung's encode program (remote compile through
    # the tunnel) — record those separately
    lat_ms, compiles = [], []
    seen_buckets = set()
    from end2end_asr_tpu.data.features import num_frames as _nf
    from end2end_asr_tpu.data.loader import pick_bucket

    fed = 0
    t_all = time.time()
    while fed < total:
        c = pcm[fed:fed + chunk]
        fed += c.size
        frames = max(_nf(fed, cfg.n_fft, cfg.hop_length), 1)
        bucket = min(pick_bucket(min(frames, cfg.src_max_len),
                                 cfg.src_buckets), cfg.src_max_len)
        first_hit = bucket not in seen_buckets
        t0 = time.time()
        st.feed(c)
        dt = (time.time() - t0) * 1000
        if first_hit and dt > 250:  # a compile, not a steady feed
            seen_buckets.add(bucket)
            compiles.append({"bucket": bucket,
                             "compile_ms": round(dt, 1)})
        else:
            seen_buckets.add(bucket)
            lat_ms.append(dt)
    final = st.flush()
    wall_s = time.time() - t_all

    lat = np.array(lat_ms) if lat_ms else np.array([0.0])
    print(json.dumps({
        "metric": "streaming feed() latency (real chip, flagship model, "
                  f"{args.seconds:.0f}s audio in {args.chunk_ms:.0f}ms "
                  "chunks)",
        "p50_ms": round(float(np.percentile(lat, 50)), 1),
        "p95_ms": round(float(np.percentile(lat, 95)), 1),
        "max_ms": round(float(lat.max()), 1),
        "feeds": len(lat_ms),
        "compiles": compiles,
        "audio_seconds": args.seconds,
        "wall_seconds": round(wall_s, 1),
        "realtime_ok": bool(float(np.percentile(lat, 95))
                            < args.chunk_ms),
        "final_len": len(final),
    }))


if __name__ == "__main__":
    main()
