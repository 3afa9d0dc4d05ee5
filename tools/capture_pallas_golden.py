#!/usr/bin/env python3
"""Capture a REAL-TPU golden for the fused Pallas feature kernel.

CI runs the kernel in interpret mode only (no TPU); this tool runs the
compiled kernel on the real chip for a fixed, reproducible input and
commits the output as tests/data/pallas_features_golden.npz. The test
(tests/test_features.py::test_pallas_golden_from_real_tpu) then locks
interpret-mode numerics to the real-chip run.

Usage (on a TPU host):
  PYTHONPATH=/root/repo:/root/.axon_site python tools/capture_pallas_golden.py
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SR, WS, WST = 16000, 0.02, 0.01
N_FFT, HOP = int(SR * WS), int(SR * WST)
LENGTHS = (4800, 2100, 4799)
SEED = 17
GOLDEN = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tests", "data",
    "pallas_features_golden.npz")


def golden_input():
    """Deterministic batch shared by the capture tool and the test."""
    from end2end_asr_tpu.data.features import num_frames
    from end2end_asr_tpu.ops.features import reflect_pad_pcm
    rs = np.random.RandomState(SEED)
    pcms = [rs.randn(n).astype(np.float32) * 0.3 for n in LENGTHS]
    T = max(num_frames(n, N_FFT, HOP) for n in LENGTHS)
    n_pcm = (T - 1) * HOP
    pad = N_FFT // 2
    pcm = np.zeros((len(pcms), n_pcm + 2 * pad), np.float32)
    frames = np.zeros(len(pcms), np.int32)
    for i, y in enumerate(pcms):
        pcm[i] = reflect_pad_pcm(y[:n_pcm], N_FFT, n_pcm)
        frames[i] = num_frames(min(len(y), n_pcm), N_FFT, HOP)
    return pcm, frames, T


def main():
    import jax
    import jax.numpy as jnp

    from end2end_asr_tpu.ops.stft_pallas import batched_features_pallas

    backend = jax.default_backend()
    if backend == "cpu":
        print("refusing to capture a golden from the CPU interpreter; "
              "run on a TPU host")
        sys.exit(1)

    pcm, frames, T = golden_input()
    out = np.asarray(batched_features_pallas(
        jnp.asarray(pcm), jnp.asarray(frames), N_FFT, HOP, "hamming",
        T_out=T, normalize=True))
    os.makedirs(os.path.dirname(GOLDEN), exist_ok=True)
    np.savez_compressed(
        GOLDEN, features=out,
        meta=np.array({"backend": backend,
                       "device": str(jax.devices()[0]),
                       "lengths": LENGTHS, "seed": SEED,
                       "n_fft": N_FFT, "hop": HOP,
                       "window": "hamming"}, dtype=object))
    print(f"captured {out.shape} golden from {jax.devices()[0]} "
          f"-> {GOLDEN}")


if __name__ == "__main__":
    main()
