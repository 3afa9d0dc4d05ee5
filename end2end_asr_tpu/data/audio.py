"""Audio I/O and augmentation.

Reference behavior (utils/audio.py): torchaudio WAV decode normalized to
[-1, 1] with multi-channel mean-downmix (:7-15), duration via `soxi -D`
subprocess (:17-20), random tempo∈[0.85,1.15] / gain∈[-6,8] dB
augmentation via per-utterance `sox` subprocesses (:35-61).

Here: a C++ shared library (native/audio_native.cc, loaded via ctypes)
decodes WAV, resamples, and applies tempo (WSOLA) / gain in-process — no
subprocess-per-utterance. A pure-NumPy fallback keeps everything working
when the native lib hasn't been built.
"""

from __future__ import annotations

import wave
from typing import Optional, Tuple

import numpy as np

from end2end_asr_tpu.native import lib as _native


# ---------------------------------------------------------------------------
# WAV decode
# ---------------------------------------------------------------------------

def load_audio(path: str) -> np.ndarray:
    """Decode a WAV file → float32 in [-1, 1], mean-downmixed to mono."""
    if _native.available():
        data = _native.decode_wav(path)
        if data is not None:
            return data
    return _load_audio_py(path)


# Extensions librosa.util.find_files matches by default (the reference
# discovers noise files with it, utils/data_loader.py:153).
AUDIO_EXTENSIONS = ("aac", "au", "flac", "m4a", "mp3", "ogg", "wav")


def find_audio_files(directory: str) -> list:
    """librosa.util.find_files semantics: recursive, case-insensitive
    match on the common audio extensions, sorted."""
    import os
    out = []
    for dp, _, fs in os.walk(directory):
        for f in fs:
            ext = f.rsplit(".", 1)[-1].lower() if "." in f else ""
            if ext in AUDIO_EXTENSIONS:
                out.append(os.path.join(dp, f))
    return sorted(out)


def decode_audio(path: str) -> Tuple[np.ndarray, int]:
    """Decode any supported audio file → (float32 mono in [-1,1], sr).

    Dispatch is by container magic, not extension: RIFF → WAV (native
    C++ decoder, Python ``wave`` fallback), ``.snd`` → Sun AU (decoded
    in-process below). Anything else tries soundfile / torchaudio if
    installed, then fails with a clear error — mirroring the breadth the
    reference gets from torchaudio+sox without requiring either.
    """
    with open(path, "rb") as f:
        magic = f.read(4)
    if magic == b"RIFF":
        if _native.available():
            got = _native.decode_wav_sr(path)
            if got is not None:
                return got  # rate from the native header read — the
                # `wave` module rejects IEEE-float WAVs we decode fine
        y = _load_audio_py(path)
        with wave.open(path, "rb") as w:
            return y, w.getframerate()
    if magic == b".snd":
        return _load_au_py(path)
    try:
        import soundfile as sf
        data, sr = sf.read(path, dtype="float32", always_2d=True)
        return data.mean(axis=1).astype(np.float32), int(sr)
    except ImportError:
        pass
    try:
        import torchaudio
        wav, sr = torchaudio.load(path)
        return wav.mean(dim=0).numpy().astype(np.float32), int(sr)
    except ImportError:
        pass
    raise ValueError(
        f"cannot decode {path!r}: not WAV/AU and neither soundfile nor "
        "torchaudio is installed")


_ULAW_BIAS = 0x84


def _ulaw_decode(u: np.ndarray) -> np.ndarray:
    """ITU-T G.711 μ-law byte → float32 in [-1, 1]."""
    u = (~u.astype(np.int32)) & 0xFF
    sign = u & 0x80
    exp = (u >> 4) & 0x07
    mant = u & 0x0F
    mag = (((mant << 3) + _ULAW_BIAS) << exp) - _ULAW_BIAS
    return np.where(sign, -mag, mag).astype(np.float32) / 32768.0


def _load_au_py(path: str) -> Tuple[np.ndarray, int]:
    """Sun/NeXT .au: 24+-byte big-endian header, then samples."""
    with open(path, "rb") as f:
        hdr = np.frombuffer(f.read(24), dtype=">u4")
        if len(hdr) < 6 or hdr[0] != 0x2E736E64:
            raise ValueError(f"not an AU file: {path!r}")
        data_offset, _, encoding, sr, n_ch = (
            int(hdr[1]), int(hdr[2]), int(hdr[3]), int(hdr[4]),
            int(hdr[5]))
        f.seek(data_offset)
        raw = f.read()
    if encoding == 1:          # 8-bit μ-law
        y = _ulaw_decode(np.frombuffer(raw, np.uint8))
    elif encoding == 2:        # int8
        y = np.frombuffer(raw, np.int8).astype(np.float32) / (1 << 7)
    elif encoding == 3:        # int16 BE
        y = np.frombuffer(raw, ">i2").astype(np.float32) / (1 << 15)
    elif encoding == 5:        # int32 BE
        y = np.frombuffer(raw, ">i4").astype(np.float32) / (1 << 31)
    elif encoding == 6:        # float32 BE
        y = np.frombuffer(raw, ">f4").astype(np.float32)
    else:
        raise ValueError(f"unsupported AU encoding {encoding} in {path!r}")
    if n_ch > 1:
        y = y[: len(y) - len(y) % n_ch].reshape(-1, n_ch).mean(axis=1)
    return y.astype(np.float32), sr


def _load_audio_py(path: str) -> np.ndarray:
    with wave.open(path, "rb") as w:
        n_channels = w.getnchannels()
        sampwidth = w.getsampwidth()
        n_frames = w.getnframes()
        raw = w.readframes(n_frames)
    if sampwidth == 2:
        sound = np.frombuffer(raw, dtype="<i2").astype(np.float32) / (1 << 15)
    elif sampwidth == 4:
        sound = np.frombuffer(raw, dtype="<i4").astype(np.float32) / (1 << 31)
    elif sampwidth == 1:
        sound = (np.frombuffer(raw, dtype=np.uint8).astype(np.float32)
                 - 128.0) / 128.0
    else:
        raise ValueError(f"unsupported sample width {sampwidth} in {path}")
    if n_channels > 1:
        sound = sound.reshape(-1, n_channels).mean(axis=1)
    return sound


def save_wav(path: str, y: np.ndarray, sample_rate: int) -> None:
    """Write mono 16-bit WAV (used by data-prep CLIs and tests)."""
    y16 = np.clip(np.asarray(y) * (1 << 15), -32768, 32767).astype("<i2")
    with wave.open(path, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(y16.tobytes())


def get_num_samples(path: str) -> int:
    """Exact PCM frame count from the WAV header (no decode). Used by the
    multi-host loader to agree on bucket shapes across processes without
    decoding remote shards."""
    if _native.available():
        n = _native.wav_num_frames(path)
        if n is not None:  # handles IEEE-float/extensible WAVs `wave`
            return n       # rejects
    with wave.open(path, "rb") as w:
        return w.getnframes()


def get_audio_length(path: str) -> float:
    """Duration in seconds (replaces the soxi -D subprocess,
    utils/audio.py:17-20)."""
    if _native.available():
        d = _native.wav_duration(path)
        if d is not None and d >= 0:
            return d
    try:
        with wave.open(path, "rb") as w:
            return w.getnframes() / float(w.getframerate())
    except (wave.Error, EOFError):
        y, sr = decode_audio(path)
        return len(y) / float(sr)


# ---------------------------------------------------------------------------
# Resample / crop
# ---------------------------------------------------------------------------

def resample(y: np.ndarray, sr_in: int, sr_out: int) -> np.ndarray:
    """Polyphase-free linear resampler (native when available)."""
    if sr_in == sr_out:
        return y
    if _native.available():
        out = _native.resample(y, sr_in, sr_out)
        if out is not None:
            return out
    n_out = int(round(len(y) * sr_out / sr_in))
    x_old = np.arange(len(y), dtype=np.float64)
    x_new = np.linspace(0, len(y) - 1, n_out)
    return np.interp(x_new, x_old, y).astype(np.float32)


def audio_with_crop(path: str, sample_rate: int, start_time: float,
                    end_time: float) -> np.ndarray:
    """Load a [start, end] second segment at sample_rate (replaces
    audio_with_sox, utils/audio.py:22-33)."""
    y, sr = decode_audio(path)
    y = resample(y, sr, sample_rate)
    i0 = int(round(start_time * sample_rate))
    i1 = int(round(end_time * sample_rate))
    return y[i0:i1]


# ---------------------------------------------------------------------------
# Tempo / gain augmentation
# ---------------------------------------------------------------------------

def apply_gain(y: np.ndarray, gain_db: float) -> np.ndarray:
    return (y * (10.0 ** (gain_db / 20.0))).astype(np.float32)


def apply_tempo(y: np.ndarray, tempo: float, sample_rate: int) -> np.ndarray:
    """Time-stretch by `tempo` (>1 = faster/shorter) preserving pitch.

    Native path: WSOLA in C++ (native/audio_native.cc). Fallback: a
    NumPy WSOLA with the same parameters.
    """
    if abs(tempo - 1.0) < 1e-6:
        return y.astype(np.float32)
    if _native.available():
        out = _native.tempo_wsola(y, tempo, sample_rate)
        if out is not None:
            return out
    return _wsola_py(y, tempo, sample_rate)


def _wsola_py(y: np.ndarray, tempo: float, sample_rate: int) -> np.ndarray:
    """Waveform-similarity overlap-add time stretching (fallback)."""
    y = np.asarray(y, np.float32)
    win = int(0.030 * sample_rate)  # 30 ms analysis window
    win -= win % 2
    hop_out = win // 2
    hop_in = tempo * hop_out
    seek = int(0.010 * sample_rate)  # ±10 ms search
    n_out = int(len(y) / tempo)
    if len(y) < 2 * win:
        # too short for WSOLA; linear resample (pitch shifts, but these
        # are sub-60ms utterances)
        x_new = np.linspace(0, len(y) - 1, max(n_out, 1))
        return np.interp(x_new, np.arange(len(y)), y).astype(np.float32)

    window = np.hanning(win).astype(np.float32)
    out = np.zeros(n_out + win, np.float32)
    norm = np.zeros(n_out + win, np.float32)

    prev = y[:win] * window
    out[:win] += prev
    norm[:win] += window
    t_out = hop_out
    pos = 0.0
    while t_out + win <= n_out:
        pos += hop_in
        center = int(pos)
        lo = max(0, center - seek)
        hi = min(len(y) - win, center + seek)
        if hi <= lo:
            break
        # pick the segment best correlated with the natural continuation
        target = prev[hop_out:]  # second half of the previous overlap
        best, best_score = lo, -np.inf
        tail_len = len(target)
        cands = np.arange(lo, hi, max(1, seek // 16))
        for c in cands:
            seg = y[c:c + tail_len]
            score = float(np.dot(seg, target))
            if score > best_score:
                best_score, best = score, c
        seg = y[best:best + win] * window
        out[t_out:t_out + win] += seg
        norm[t_out:t_out + win] += window
        prev = seg
        t_out += hop_out
    norm = np.maximum(norm, 1e-6)
    return (out[:n_out] / norm[:n_out]).astype(np.float32)


def augment_audio(y: np.ndarray, sample_rate: int, tempo: float,
                  gain_db: float) -> np.ndarray:
    """tempo + gain, replacing augment_audio_with_sox (utils/audio.py:35-47)."""
    return apply_gain(apply_tempo(y, tempo, sample_rate), gain_db)


def load_randomly_augmented_audio(path: str, sample_rate: int = 16000,
                                  tempo_range: Tuple[float, float] = (0.85, 1.15),
                                  gain_range: Tuple[float, float] = (-6, 8),
                                  rng: Optional[np.random.RandomState] = None
                                  ) -> np.ndarray:
    """Random tempo/gain perturbation (utils/audio.py:50-61) with an
    explicit RNG (the reference uses unseeded np.random per worker)."""
    rng = rng or np.random
    tempo = rng.uniform(*tempo_range)
    gain = rng.uniform(*gain_range)
    # the reference's augment pipes through `sox -r {sample_rate}`
    # (utils/audio.py:39-44): mismatched-rate corpora get resampled on
    # the augment path (the plain load path does NOT — parity)
    y, sr = decode_audio(path)
    y = resample(y, sr, sample_rate)
    return augment_audio(y, sample_rate, tempo, gain)
