"""Host-side (NumPy) feature extraction oracle.

Reproduces the reference's per-utterance pipeline
(utils/data_loader.py:60-91): librosa STFT (center=True, reflect padding,
win_length = n_fft = sample_rate*window_size, hop = sample_rate*
window_stride, symmetric window), magnitude, log1p, per-utterance
mean/std normalization (std unbiased, like torch.Tensor.std).

This path exists for (a) CPU tests as the numerics oracle for the
on-device featurizer (ops/features.py, ops/stft_pallas.py) and (b) a
fallback when feature extraction must happen on host. Production training
feeds raw PCM to the device and runs the fused kernel there.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

_WINDOWS = {
    "hamming": np.hamming,
    "hann": np.hanning,
    "blackman": np.blackman,
    "bartlett": np.bartlett,
}


def get_window(name: str, n: int) -> np.ndarray:
    """Symmetric window, matching scipy.signal.<name>(n) defaults used by
    the reference (utils/data_loader.py:20-21)."""
    fn = _WINDOWS.get(name, np.hamming)
    return fn(n).astype(np.float32)


def stft_magnitude(y: np.ndarray, n_fft: int, hop_length: int,
                   window: str = "hamming") -> np.ndarray:
    """|STFT| with librosa conventions: center=True reflect padding,
    win_length = n_fft. Returns (n_fft//2+1, n_frames)."""
    y = np.asarray(y, dtype=np.float32)
    pad = n_fft // 2
    ypad = np.pad(y, pad, mode="reflect")
    n_frames = 1 + (len(ypad) - n_fft) // hop_length
    w = get_window(window, n_fft)
    idx = (np.arange(n_fft)[None, :]
           + hop_length * np.arange(n_frames)[:, None])
    frames = ypad[idx] * w[None, :]
    spec = np.fft.rfft(frames, n=n_fft, axis=1)
    return np.abs(spec).T.astype(np.float32)


def num_frames(n_samples: int, n_fft: int, hop_length: int) -> int:
    """librosa center=True frame count: 1 + n_samples//hop."""
    pad = n_fft // 2
    return 1 + (n_samples + 2 * pad - n_fft) // hop_length


def parse_audio_features(y: np.ndarray, sample_rate: int, window_size: float,
                         window_stride: float, window: str = "hamming",
                         normalize: bool = True,
                         src_max_len: Optional[int] = None) -> np.ndarray:
    """Full reference feature pipeline for one utterance → (F, T)."""
    n_fft = int(sample_rate * window_size)
    hop = int(sample_rate * window_stride)
    spect = np.log1p(stft_magnitude(y, n_fft, hop, window))
    if normalize:
        mean = spect.mean()
        std = spect.std(ddof=1)  # torch.Tensor.std is unbiased
        spect = (spect - mean) / max(std, 1e-10)
    if src_max_len is not None:
        spect = spect[:, :src_max_len]
    return spect.astype(np.float32)
