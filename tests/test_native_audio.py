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


def _write_extensible_float_wav(path, y, sr):
    """WAVE_FORMAT_EXTENSIBLE (0xFFFE) wrapping IEEE-float32 — the
    standard DAW/ffmpeg output the `wave` module rejects."""
    import struct
    data = np.asarray(y, np.float32).tobytes()
    chunk = struct.pack("<HHIIHHH", 0xFFFE, 1, sr, sr * 4, 4, 32, 22)
    chunk += struct.pack("<HI", 32, 0)  # valid bits, channel mask
    chunk += struct.pack("<H", 3)       # SubFormat code: IEEE float
    chunk += b"\x00\x00\x00\x00\x10\x00\x80\x00\x00\xaa\x00\x38\x9b\x71"
    hdr = b"RIFF" + struct.pack("<I", 4 + 8 + len(chunk) + 8 + len(data))
    hdr += b"WAVE" + b"fmt " + struct.pack("<I", len(chunk)) + chunk
    hdr += b"data" + struct.pack("<I", len(data))
    with open(path, "wb") as f:
        f.write(hdr + data)


def test_extensible_float_wav_decodes_as_float(tmp_path):
    """0xFFFE-extensible float32: the SubFormat GUID's code (3) must be
    honored — mapping it to PCM reinterprets float bits as int32
    garbage (e.g. 1.0f -> 0.496)."""
    from end2end_asr_tpu.data.audio import decode_audio
    from end2end_asr_tpu.native import lib

    if not lib.available():
        import pytest
        pytest.skip("native lib unavailable")
    y = np.array([0.0, 0.5, -0.5, 1.0, -1.0, 0.25], np.float32)
    p = str(tmp_path / "ext.wav")
    _write_extensible_float_wav(p, y, 16000)
    got, sr = decode_audio(p)
    assert sr == 16000
    np.testing.assert_allclose(got, y, atol=1e-7)


def test_adpcm_wav_rejected_not_sigfpe(tmp_path):
    """4-bit (ADPCM-style) WAVs must FAIL cleanly from the native
    decoder (bps/8 == 0 used to integer-divide-by-zero -> SIGFPE killing
    the loader process)."""
    import struct

    from end2end_asr_tpu.native import lib

    if not lib.available():
        import pytest
        pytest.skip("native lib unavailable")
    chunk = struct.pack("<HHIIHH", 2, 1, 8000, 4000, 256, 4)  # fmt=ADPCM
    data = b"\x00" * 512
    hdr = b"RIFF" + struct.pack("<I", 4 + 8 + len(chunk) + 8 + len(data))
    hdr += b"WAVE" + b"fmt " + struct.pack("<I", len(chunk)) + chunk
    hdr += b"data" + struct.pack("<I", len(data))
    p = str(tmp_path / "adpcm.wav")
    with open(p, "wb") as f:
        f.write(hdr + data)
    assert lib.decode_wav(p) is None        # clean failure, process alive
    assert lib.wav_num_frames(p) is None
    assert lib.wav_duration(p) is None


def test_augment_resamples_mismatched_rate(tmp_path):
    """The augment path resamples to the target rate like the
    reference's `sox -r {sample_rate}` (utils/audio.py:39-44)."""
    from end2end_asr_tpu.data.audio import (load_randomly_augmented_audio,
                                            save_wav)

    y8k = np.sin(np.linspace(0, 40 * np.pi, 8000)).astype(np.float32)
    p = str(tmp_path / "a8k.wav")
    save_wav(p, y8k, 8000)
    out = load_randomly_augmented_audio(
        p, sample_rate=16000, tempo_range=(1.0, 1.0),
        gain_range=(0.0, 0.0), rng=np.random.RandomState(0))
    assert abs(len(out) - 16000) <= 32  # ~2x the 8 kHz samples
