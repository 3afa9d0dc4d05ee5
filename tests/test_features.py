"""Feature numerics: host oracle (librosa-convention NumPy) vs on-device
XLA featurizer vs the fused Pallas kernel (interpret mode on CPU)."""

import numpy as np
import jax.numpy as jnp
import pytest

from end2end_asr_tpu.data.features import (num_frames, parse_audio_features,
                                           stft_magnitude)
from end2end_asr_tpu.ops.features import batched_features, reflect_pad_pcm
from end2end_asr_tpu.ops.stft_pallas import (batched_features_pallas,
                                             pallas_supported)

SR, WS, WST = 16000, 0.02, 0.01
N_FFT, HOP = int(SR * WS), int(SR * WST)


def _batch(lengths, seed=0):
    rs = np.random.RandomState(seed)
    pcms = [rs.randn(n).astype(np.float32) * 0.3 for n in lengths]
    T = max(num_frames(n, N_FFT, HOP) for n in lengths)
    n_pcm = (T - 1) * HOP
    pad = N_FFT // 2
    pcm = np.zeros((len(pcms), n_pcm + 2 * pad), np.float32)
    frames = np.zeros(len(pcms), np.int32)
    for i, y in enumerate(pcms):
        pcm[i] = reflect_pad_pcm(y[:n_pcm], N_FFT, n_pcm)
        frames[i] = num_frames(min(len(y), n_pcm), N_FFT, HOP)
    return pcms, pcm, frames, T


def test_stft_magnitude_matches_librosa_convention():
    librosa = pytest.importorskip("librosa")
    y = np.random.RandomState(0).randn(5000).astype(np.float32)
    ours = stft_magnitude(y, N_FFT, HOP, "hamming")
    import scipy.signal
    D = librosa.stft(y, n_fft=N_FFT, hop_length=HOP, win_length=N_FFT,
                     window=scipy.signal.get_window("hamming", N_FFT))
    np.testing.assert_allclose(ours, np.abs(D), rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("window", ["hamming", "hann"])
def test_device_features_match_host_oracle(window):
    lengths = [4800, 3200, 4799]
    pcms, pcm, frames, T = _batch(lengths)
    dev = np.asarray(batched_features(
        jnp.asarray(pcm), jnp.asarray(frames), N_FFT, HOP, window,
        T_out=T, normalize=True))
    for i, y in enumerate(pcms):
        host = parse_audio_features(y, SR, WS, WST, window, normalize=True)
        ti = host.shape[1]
        np.testing.assert_allclose(dev[i, :, :ti], host,
                                   rtol=2e-3, atol=2e-3)
        assert np.allclose(dev[i, :, ti:], 0.0)


def test_pallas_kernel_matches_xla_featurizer():
    assert pallas_supported(N_FFT, HOP)
    lengths = [4800, 2100]
    _, pcm, frames, T = _batch(lengths, seed=3)
    ref = np.asarray(batched_features(
        jnp.asarray(pcm), jnp.asarray(frames), N_FFT, HOP, "hamming",
        T_out=T, normalize=True))
    got = np.asarray(batched_features_pallas(
        jnp.asarray(pcm), jnp.asarray(frames), N_FFT, HOP, "hamming",
        T_out=T, normalize=True))
    np.testing.assert_allclose(got, ref, rtol=2e-3, atol=2e-3)


def test_pallas_golden_from_real_tpu():
    """Interpret-mode Pallas numerics locked to a committed REAL-TPU run
    (tests/data/pallas_features_golden.npz, captured on v5e by
    tools/capture_pallas_golden.py). Regresses both directions: a kernel
    change that diverges on-chip fails when the golden is recaptured; a
    change that breaks interpret-vs-chip agreement fails here."""
    import os
    from tools.capture_pallas_golden import (GOLDEN, HOP as G_HOP,
                                             N_FFT as G_NFFT, golden_input)
    if not os.path.exists(GOLDEN):
        pytest.skip("no committed real-TPU golden")
    data = np.load(GOLDEN, allow_pickle=True)
    golden = data["features"]
    pcm, frames, T = golden_input()
    got = np.asarray(batched_features_pallas(
        jnp.asarray(pcm), jnp.asarray(frames), G_NFFT, G_HOP, "hamming",
        T_out=T, normalize=True))
    assert got.shape == golden.shape
    # the chip's f32 jnp.dot runs MXU default precision (bf16 multiply
    # passes), so real-TPU DFT magnitudes differ from the interpreter's
    # exact f32 at ~1e-2 after log1p+normalize; the committed golden had
    # max |diff| 0.037 (28% of elements beyond 2e-3). The tolerance locks
    # that envelope — real regressions (wrong frames/windows/normalize)
    # are orders of magnitude larger.
    np.testing.assert_allclose(got, golden, rtol=5e-2, atol=6e-2)


def test_num_frames_matches_oracle():
    for n in (1600, 1601, 4799, 4800):
        y = np.zeros(n, np.float32)
        assert num_frames(n, N_FFT, HOP) == \
            stft_magnitude(y, N_FFT, HOP).shape[1]
