"""Fused Pallas TPU kernel for spectrogram feature extraction.

Replaces the reference's per-utterance librosa STFT in DataLoader workers
(utils/data_loader.py:60-91) with one on-device kernel per batch:
frame → window → DFT (MXU matmul against a windowed cos/sin basis) →
magnitude → log1p, tiled over (utterance, time) with everything resident
in VMEM. Per-utterance masked mean/std normalization is a cheap fused XLA
epilogue over the kernel's output.

Framing trick: with the reference's default 20ms/10ms windows,
n_fft = 2·hop exactly, so frame t = [chunk_t ‖ chunk_{t+1}] where
chunk_i = pcm[i·hop:(i+1)·hop] — a reshape + static slice + concat, no
gather (TPU gathers are slow; reshapes are free). Configs where
n_fft % hop != 0 fall back to ops/features.batched_features (same math,
XLA-fused).

The DFT-as-matmul basis is (n_fft, Fp) per cos/sin with Fp = n_freq
rounded up to the 128-lane boundary — two (TILE_T×320)@(320×Fp) MXU
matmuls per tile.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from end2end_asr_tpu.data.features import get_window

LANE = 128


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


@functools.lru_cache(maxsize=8)
def _padded_basis(n_fft: int, window: str) -> Tuple[np.ndarray, np.ndarray, int]:
    n_freq = n_fft // 2 + 1
    Fp = _round_up(n_freq, LANE)
    k = np.arange(n_fft)[:, None]
    f = np.arange(n_freq)[None, :]
    ang = 2.0 * np.pi * k * f / n_fft
    w = get_window(window, n_fft).astype(np.float64)[:, None]
    cos = np.zeros((n_fft, Fp), np.float32)
    sin = np.zeros((n_fft, Fp), np.float32)
    cos[:, :n_freq] = (np.cos(ang) * w).astype(np.float32)
    sin[:, :n_freq] = (-np.sin(ang) * w).astype(np.float32)
    return cos, sin, Fp


def _stft_kernel(left_ref, right_ref, cos_ref, sin_ref, out_ref, *,
                 hop: int):
    """Grid (B, nT). Frame t = [chunk_t ‖ chunk_{t+1}] (n_fft = 2·hop),
    so the DFT splits into two MXU matmuls against the basis halves:
        proj = chunk[t] @ basis[:hop] + chunk[t+1] @ basis[hop:]
    left/right blocks are the two overlapping chunk windows (framing is
    two reshape-views prepared by XLA — Mosaic's 128-lane tiling cannot
    DMA hop=160-wide rows directly). Fused per tile: 4 dots + magnitude
    + log1p, all VMEM-resident.
    """
    x0, x1 = left_ref[0], right_ref[0]
    cos, sin = cos_ref[:], sin_ref[:]
    re = (jnp.dot(x0, cos[:hop], preferred_element_type=jnp.float32)
          + jnp.dot(x1, cos[hop:], preferred_element_type=jnp.float32))
    im = (jnp.dot(x0, sin[:hop], preferred_element_type=jnp.float32)
          + jnp.dot(x1, sin[hop:], preferred_element_type=jnp.float32))
    out_ref[0] = jnp.log1p(jnp.sqrt(re * re + im * im))


def pallas_supported(n_fft: int, hop: int) -> bool:
    return n_fft == 2 * hop


def _batched_features_impl(pcm_padded: jnp.ndarray,
                           n_valid_frames: jnp.ndarray,
                           cos: jnp.ndarray, sin: jnp.ndarray,
                           n_fft: int, hop: int, T_out: int,
                           normalize: bool = True) -> jnp.ndarray:
    """Same contract as ops.features.batched_features: (B, N+2·(n_fft//2))
    host-reflect-padded PCM → (B, F, T_out) normalized log-spectrograms.
    The DFT basis (cos, sin) is an explicit operand: custom_partitioning
    requires a const-free jaxpr, so the caller passes it in."""
    assert pallas_supported(n_fft, hop), "kernel requires n_fft == 2*hop"
    B, N2p = pcm_padded.shape
    n_freq = n_fft // 2 + 1
    Fp = cos.shape[1]

    tile_t = min(256, _round_up(T_out, 8))
    nT = pl.cdiv(T_out, tile_t)
    T_pad = nT * tile_t
    # frame t reads hop-chunks [t, t+1]; the last tile touches chunk
    # T_pad, so nC = T_pad + 1 chunks must exist
    nC = T_pad + 1
    need = nC * hop
    if need > N2p:
        pcm_padded = jnp.pad(pcm_padded, ((0, 0), (0, need - N2p)))
    chunks = pcm_padded[:, :need].reshape(B, nC, hop)
    left = chunks[:, :-1]   # (B, T_pad, hop) — view, no copy in XLA
    right = chunks[:, 1:]

    out = pl.pallas_call(
        functools.partial(_stft_kernel, hop=hop),
        grid=(B, nT),
        interpret=jax.default_backend() == "cpu",
        in_specs=[
            pl.BlockSpec((1, tile_t, hop), lambda b, t: (b, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_t, hop), lambda b, t: (b, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_fft, Fp), lambda b, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_fft, Fp), lambda b, t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile_t, Fp), lambda b, t: (b, t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, T_pad, Fp), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * B * T_pad * n_fft * Fp,
            bytes_accessed=B * (2 * T_pad * hop + T_pad * Fp) * 4,
            transcendentals=B * T_pad * Fp,
        ),
    )(left, right, cos, sin)

    spect = out[:, :T_out, :n_freq]  # (B, T, F)

    # pad-masking + per-utterance normalization shared with the XLA
    # featurizer — one owner for the parity-sensitive epilogue
    from end2end_asr_tpu.ops.features import mask_normalize
    return mask_normalize(spect, n_valid_frames, n_freq, T_out,
                          normalize)


# Under a sharded jit the custom call would otherwise be replicated
# (XLA cannot partition through tpu_custom_call); every row is
# independent, so declare batch-dim partitioning explicitly.
from end2end_asr_tpu.ops.partition import batch_partitioned  # noqa: E402

_batched_features_partitioned = batch_partitioned(
    _batched_features_impl, batch_args=(0, 1), n_out=1,
    static_argnums=(4, 5, 6, 7),
    sharding_rule="b l, b, k f, k f -> b g t")


@functools.partial(jax.jit, static_argnames=("n_fft", "hop", "window",
                                             "T_out", "normalize"))
def batched_features_pallas(pcm_padded, n_valid_frames, n_fft, hop,
                            window, T_out, normalize=True):
    from end2end_asr_tpu.ops.features import pcm_to_f32
    pcm_padded = pcm_to_f32(pcm_padded)  # int16 wire → f32, pre-kernel
    cos, sin, _ = _padded_basis(n_fft, window)
    return _batched_features_partitioned(
        pcm_padded, n_valid_frames, jnp.asarray(cos), jnp.asarray(sin),
        n_fft, hop, T_out, normalize)
