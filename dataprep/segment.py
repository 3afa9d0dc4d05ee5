"""Segment long recordings into per-utterance WAVs from a time-aligned
transcript (reference: data/helper.py:384-414 preprocess_wav, which shells
out to sox per segment; here the crop happens in-process via the native
audio runtime).

Transcript format: one utterance per line,
    <id>\t<start_ms>\t<end_ms>\t<speaker>\t<text>
"""

from __future__ import annotations

import os
from typing import List, Tuple

from end2end_asr_tpu.data.audio import load_audio, save_wav


def parse_segments(transcript_path: str) -> List[Tuple[float, float, str]]:
    segments = []
    with open(transcript_path, encoding="utf-8") as f:
        for line in f:
            data = line.rstrip("\n").split("\t")
            if len(data) < 5:
                continue
            start = float(data[1]) / 1000.0
            end = float(data[2]) / 1000.0
            segments.append((start, end, data[4]))
    return segments


def segment_wav_by_transcript(audio_path: str, transcript_path: str,
                              out_wav_dir: str, out_txt_dir: str,
                              basename: str,
                              sample_rate: int = 16000) -> int:
    """Write one wav+txt pair per transcript segment; returns count."""
    os.makedirs(out_wav_dir, exist_ok=True)
    os.makedirs(out_txt_dir, exist_ok=True)
    y = load_audio(audio_path)
    import wave
    with wave.open(audio_path, "rb") as w:
        sr = w.getframerate()
    n = 0
    for i, (start, end, text) in enumerate(parse_segments(transcript_path)):
        i0, i1 = int(start * sr), int(end * sr)
        if i1 <= i0 or i0 >= len(y):
            continue
        seg = y[i0:min(i1, len(y))]
        if sr != sample_rate:
            from end2end_asr_tpu.data.audio import resample
            seg = resample(seg, sr, sample_rate)
        save_wav(os.path.join(out_wav_dir, f"{basename}_{i}.wav"),
                 seg, sample_rate)
        with open(os.path.join(out_txt_dir, f"{basename}_{i}.txt"),
                  "w", encoding="utf-8") as f:
            f.write(text + "\n")
        n += 1
    return n
