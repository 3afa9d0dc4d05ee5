"""On-device batched feature extraction (STFT → log1p → normalize).

TPU-first replacement for the reference's per-utterance librosa STFT in
DataLoader worker processes (utils/data_loader.py:60-91): the host only
decodes WAV and reflect-pads the edges; the whole batch is framed,
windowed, Fourier-transformed (DFT as a single MXU matmul), magnitude'd,
log1p'd and masked-normalized in one XLA program on device.

The rFFT of a 320-sample frame is computed as frames @ [cos | -sin]
(320 × 2·161): at these sizes a dense DFT matmul on the MXU beats any
radix FFT butterfly structure, and it fuses with the surrounding
elementwise work. A fully fused Pallas variant lives in ops/stft_pallas.py.

Numerics match data/features.py (the librosa-convention host oracle) to
float32 tolerance, including unbiased std (torch.Tensor.std semantics).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from end2end_asr_tpu.data.features import get_window


@functools.lru_cache(maxsize=8)
def _dft_matrices(n_fft: int, window: str) -> Tuple[np.ndarray, np.ndarray]:
    """Windowed DFT basis: returns (W_cos, W_sin), each (n_fft, n_freq)."""
    n_freq = n_fft // 2 + 1
    k = np.arange(n_fft)[:, None]
    f = np.arange(n_freq)[None, :]
    ang = 2.0 * np.pi * k * f / n_fft
    w = get_window(window, n_fft).astype(np.float64)[:, None]
    cos = (np.cos(ang) * w).astype(np.float32)
    sin = (-np.sin(ang) * w).astype(np.float32)
    return cos, sin


def reflect_pad_pcm(y: np.ndarray, n_fft: int, out_len: int) -> np.ndarray:
    """Host-side prep for one utterance: center reflect-pad (librosa
    center=True) then zero-fill to out_len + 2*pad. The reflection depends
    on each utterance's true length, so it cannot be batched on device."""
    pad = n_fft // 2
    ypad = np.pad(np.asarray(y, np.float32), pad, mode="reflect")
    out = np.zeros(out_len + 2 * pad, np.float32)
    out[:len(ypad)] = ypad[:len(out)]
    return out


def pcm_to_f32(pcm: jnp.ndarray) -> jnp.ndarray:
    """De-scale int16 wire-format PCM (data/loader.py pcm_wire_dtype) on
    device: int16/32768 is bit-identical to the host-side normalization
    the WAV decode would have applied (samples ARE int16 on disk)."""
    if pcm.dtype == jnp.int16:
        return pcm.astype(jnp.float32) * jnp.float32(1.0 / 32768.0)
    return pcm


@functools.partial(jax.jit, static_argnames=("n_fft", "hop", "window",
                                             "T_out", "normalize"))
def batched_features(pcm_padded: jnp.ndarray, n_valid_frames: jnp.ndarray,
                     n_fft: int, hop: int, window: str, T_out: int,
                     normalize: bool = True) -> jnp.ndarray:
    """pcm_padded: (B, N + 2*(n_fft//2)) host-reflect-padded PCM (f32, or
    int16 wire format). n_valid_frames: (B,) = 1 + n_samples//hop.
    Returns (B, F, T_out) log-spectrograms, zero outside the valid region.
    """
    pcm_padded = pcm_to_f32(pcm_padded)
    B = pcm_padded.shape[0]
    n_freq = n_fft // 2 + 1

    # frame: (B, T_out, n_fft) gather with static indices
    idx = (np.arange(T_out)[:, None] * hop + np.arange(n_fft)[None, :])
    frames = pcm_padded[:, idx]  # (B, T_out, n_fft)

    cos, sin = _dft_matrices(n_fft, window)
    basis = jnp.asarray(np.concatenate([cos, sin], axis=1))  # (n_fft, 2F)
    proj = jnp.einsum("btn,nf->btf", frames, basis,
                      preferred_element_type=jnp.float32)
    re, im = proj[..., :n_freq], proj[..., n_freq:]
    mag = jnp.sqrt(re * re + im * im)
    spect = jnp.log1p(mag)  # (B, T_out, F)

    return mask_normalize(spect, n_valid_frames, n_freq, T_out,
                          normalize)


def mask_normalize(spect: jnp.ndarray, n_valid_frames: jnp.ndarray,
                   n_freq: int, T_out: int,
                   normalize: bool) -> jnp.ndarray:
    """Shared epilogue for the XLA and Pallas featurizers: zero the pad
    frames and apply per-utterance mean/std over the valid (F × T_i)
    region — unbiased std like torch.Tensor.std (data_loader.py:85-89).
    One owner: this computation is reference-parity-sensitive, so the
    two feature paths must never drift apart. spect: (B, T_out, F) →
    returns (B, F, T_out)."""
    t_valid = (jnp.arange(T_out)[None, :] < n_valid_frames[:, None])
    spect = spect * t_valid[:, :, None]

    if normalize:
        count = (n_valid_frames * n_freq).astype(jnp.float32)[:, None, None]
        mean = jnp.sum(spect, axis=(1, 2), keepdims=True) / count
        sq = jnp.sum(jnp.square(spect - mean) * t_valid[:, :, None],
                     axis=(1, 2), keepdims=True)
        std = jnp.sqrt(sq / jnp.maximum(count - 1.0, 1.0))
        spect = (spect - mean) / jnp.maximum(std, 1e-10)
        spect = spect * t_valid[:, :, None]

    return jnp.transpose(spect, (0, 2, 1))  # (B, F, T_out)
