"""Synthetic tiny corpus helpers for tests (wavs + transcripts + manifest
+ labels), standing in for the LibriSpeech test-clean mini config."""

import json
import os

import numpy as np

from end2end_asr_tpu.data.audio import save_wav

TEXTS = ["abba", "cab", "back", "cabba"]


def make_corpus(root, texts=None, sample_rate=16000, seed=0,
                seconds=(0.25, 0.45), exact_samples=None):
    """exact_samples pins every utterance to one length — with a bucket of
    1 + exact_samples//hop frames there is zero encoder padding, avoiding
    the reference's train/decode cross-mask mismatch for the no-frontend
    config (greedy decodes with dec_enc_attn_mask=None,
    transformer.py:342-348)."""
    texts = texts or TEXTS
    rng = np.random.RandomState(seed)
    wav_dir = os.path.join(root, "wav")
    txt_dir = os.path.join(root, "txt")
    os.makedirs(wav_dir, exist_ok=True)
    os.makedirs(txt_dir, exist_ok=True)
    rows = []
    for i, text in enumerate(texts):
        dur = rng.uniform(*seconds)
        n = exact_samples if exact_samples else int(dur * sample_rate)
        # distinct per-utterance signature so the model can memorize
        t = np.arange(n) / sample_rate
        f0 = 200.0 + 120.0 * i
        y = (0.4 * np.sin(2 * np.pi * f0 * t)
             + 0.1 * rng.randn(n)).astype(np.float32)
        wav = os.path.join(wav_dir, f"u{i}.wav")
        txt = os.path.join(txt_dir, f"u{i}.txt")
        save_wav(wav, y, sample_rate)
        with open(txt, "w") as f:
            f.write(text)
        rows.append(f"{wav},{txt}")
    manifest = os.path.join(root, "manifest.csv")
    with open(manifest, "w") as f:
        f.write("\n".join(rows) + "\n")
    labels_path = os.path.join(root, "labels.json")
    chars = sorted(set("".join(texts)))
    with open(labels_path, "w") as f:
        json.dump(chars, f)
    return manifest, labels_path
