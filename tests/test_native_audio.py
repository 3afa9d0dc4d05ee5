"""Native C++ audio runtime: WAV decode (all supported widths,
multichannel downmix), duration, resample, WSOLA tempo, edit distance —
each against a NumPy/Python oracle."""

import wave

import numpy as np
import pytest

from end2end_asr_tpu.data import audio as A
from end2end_asr_tpu.native import lib as native
from end2end_asr_tpu.utils.metrics import _edit_distance_py, edit_distance


def _write_wav(path, data, sr=16000, sampwidth=2, channels=1):
    with wave.open(str(path), "wb") as w:
        w.setnchannels(channels)
        w.setsampwidth(sampwidth)
        w.setframerate(sr)
        w.writeframes(data.tobytes())


def test_native_available():
    assert native.available(), "libasrnative.so should build via make"


def test_wav_decode_16bit_matches_python(tmp_path):
    y = (np.sin(np.linspace(0, 40, 4000)) * 20000).astype("<i2")
    p = tmp_path / "a.wav"
    _write_wav(p, y)
    got = native.decode_wav(str(p))
    ref = A._load_audio_py(str(p))
    np.testing.assert_allclose(got, ref, atol=1e-6)
    assert abs(A.get_audio_length(str(p)) - 0.25) < 1e-6


def test_wav_decode_stereo_downmix(tmp_path):
    left = (np.ones(100) * 10000).astype("<i2")
    right = (np.ones(100) * -10000).astype("<i2")
    inter = np.empty(200, "<i2")
    inter[0::2], inter[1::2] = left, right
    p = tmp_path / "st.wav"
    _write_wav(p, inter, channels=2)
    got = A.load_audio(str(p))
    np.testing.assert_allclose(got, np.zeros(100), atol=1e-4)


def test_wav_decode_8bit_and_32bit(tmp_path):
    y8 = np.arange(0, 200, dtype=np.uint8)
    p8 = tmp_path / "u8.wav"
    _write_wav(p8, y8, sampwidth=1)
    got = native.decode_wav(str(p8))
    ref = A._load_audio_py(str(p8))
    np.testing.assert_allclose(got, ref, atol=1e-6)

    y32 = (np.linspace(-1, 1, 300) * (2 ** 30)).astype("<i4")
    p32 = tmp_path / "i32.wav"
    _write_wav(p32, y32, sampwidth=4)
    got = native.decode_wav(str(p32))
    ref = A._load_audio_py(str(p32))
    np.testing.assert_allclose(got, ref, atol=1e-6)


def test_resample_native_vs_numpy():
    y = np.sin(np.linspace(0, 100, 8000)).astype(np.float32)
    got = native.resample(y, 8000, 16000)
    x_new = np.linspace(0, len(y) - 1, int(len(y) * 2))
    ref = np.interp(x_new, np.arange(len(y)), y)
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=1e-4)


def test_wsola_tempo_properties():
    sr = 16000
    t = np.arange(sr) / sr
    y = np.sin(2 * np.pi * 440 * t).astype(np.float32)
    for tempo in (0.85, 1.15):
        out = A.apply_tempo(y, tempo, sr)
        # length scales ~1/tempo
        assert abs(len(out) - len(y) / tempo) < 0.02 * len(y)
        # pitch preserved: dominant frequency stays ~440 Hz
        mid = out[len(out) // 4: len(out) // 4 + 8192]
        spec = np.abs(np.fft.rfft(mid * np.hanning(len(mid))))
        peak_hz = np.argmax(spec) * sr / len(mid)
        assert abs(peak_hz - 440) < 15, (tempo, peak_hz)


def test_gain():
    y = np.ones(10, np.float32)
    np.testing.assert_allclose(A.apply_gain(y, 6.0),
                               10 ** (6 / 20) * y, rtol=1e-6)


def test_edit_distance_native_matches_python():
    cases = [("kitten", "sitting"), ("", "abc"), ("abc", ""),
             ("同样的 text", "同样的 test"), ("aaa", "aaa")]
    for a, b in cases:
        assert edit_distance(a, b) == _edit_distance_py(a, b)


def test_noise_injection(tmp_path):
    import os
    from end2end_asr_tpu.data.dataset import NoiseInjector
    from end2end_asr_tpu.data.audio import save_wav
    os.makedirs(tmp_path / "noise", exist_ok=True)
    rng = np.random.RandomState(0)
    save_wav(str(tmp_path / "noise" / "n.wav"),
             rng.randn(32000).astype(np.float32) * 0.1, 16000)
    inj = NoiseInjector(str(tmp_path / "noise"), 16000, (0.3, 0.5))
    clean = np.sin(np.linspace(0, 100, 8000)).astype(np.float32)
    noisy = inj.inject_noise(clean, np.random.RandomState(1))
    assert noisy.shape == clean.shape
    assert not np.allclose(noisy, clean)
    # mixed at bounded SNR: perturbation energy is a fraction of signal
    ratio = np.linalg.norm(noisy - clean) / np.linalg.norm(clean)
    assert 0.1 < ratio < 1.0, ratio
