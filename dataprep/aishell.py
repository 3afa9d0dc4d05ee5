#!/usr/bin/env python3
"""AiShell-1 preparation CLI (reference: data/aishell.py).

Expects the dataset already downloaded/extracted under --root with the
reference layout:
    <root>/wav/{train,dev,test}/<speaker>/<utt>.wav
    <root>/transcript/{train,dev,test}/<speaker>/<utt>.txt  (raw)

Produces, like the reference:
  * cleaned transcripts under <root>/transcript_clean/…
  * language-tagged char-separated transcripts under
    <root>/transcript_clean_lang/…
  * 6 manifests (train/dev/test × {plain,lang}) under --manifest-dir
  * labels/aishell_labels.json + labels/aishell_lang_labels.json
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dataprep.text import (CHINESE_TAG, ENGLISH_TAG, add_lang, preprocess,
                           separate_chinese_chars)  # noqa: E402


def traverse(root: str, path: str, suffix: str = ""):
    out = []
    p = os.path.join(root, path)
    for sp in sorted(os.listdir(p)):
        spdir = os.path.join(p, sp)
        if not os.path.isdir(spdir):
            continue
        for f in sorted(os.listdir(spdir)):
            if f.endswith(suffix):
                out.append(os.path.join(spdir, f))
    return out


def clean_split(root: str, split: str):
    """Clean every raw transcript of a split; writes transcript_clean and
    transcript_clean_lang trees. Returns list of (wav, txt, lang_txt)."""
    raw_files = traverse(root, os.path.join("transcript", split))
    rows = []
    for raw in raw_files:
        # raw transcript names may embed ".wav" (reference strips it,
        # data/aishell.py:196-197); cleaned files always end in .txt
        clean_path = (raw.replace("transcript", "transcript_clean", 1)
                      .replace(".wav", ""))
        lang_path = (raw.replace("transcript", "transcript_clean_lang", 1)
                     .replace(".wav", ""))
        if not clean_path.endswith(".txt"):
            clean_path += ".txt"
        if not lang_path.endswith(".txt"):
            lang_path += ".txt"
        with open(raw, encoding="utf-8") as f:
            line = f.readline()
        line = preprocess(line).strip()
        lang_line = separate_chinese_chars(add_lang(line)).replace("  ", " ")
        if not line:
            continue
        os.makedirs(os.path.dirname(clean_path), exist_ok=True)
        with open(clean_path, "w", encoding="utf-8") as f:
            f.write(line + "\n")
        os.makedirs(os.path.dirname(lang_path), exist_ok=True)
        with open(lang_path, "w", encoding="utf-8") as f:
            f.write(lang_line + "\n")
        wav = raw.replace("transcript", "wav", 1)
        if wav.endswith(".txt"):
            wav = wav[:-4]
        if not wav.endswith(".wav"):
            wav += ".wav"
        rows.append((wav, clean_path, lang_path))
    return rows


def write_manifest(rows, path: str, lang: bool, labels: dict):
    with open(path, "w", encoding="utf-8") as mf:
        for wav, txt, lang_txt in rows:
            t = lang_txt if lang else txt
            if not (os.path.isfile(wav) and os.path.isfile(t)):
                continue
            with open(t, encoding="utf-8") as f:
                for ch in f.read():
                    if ch not in ("\n", "\r", "\t"):
                        labels[ch] = True
            mf.write(f"{os.path.abspath(wav)},{os.path.abspath(t)}\n")


def write_labels(labels: dict, path: str):
    """AiShell label JSON layout — one owner (dataprep/utils.py)."""
    from dataprep.utils import write_labels_json
    write_labels_json(labels, path)


def main():
    ap = argparse.ArgumentParser(description="AiShell-1 preparation")
    ap.add_argument("--root", default="Aishell_dataset/")
    ap.add_argument("--manifest-dir", default="manifests/")
    ap.add_argument("--labels-dir", default="labels/")
    args = ap.parse_args()

    os.makedirs(args.manifest_dir, exist_ok=True)
    os.makedirs(args.labels_dir, exist_ok=True)

    print("PREPROCESSING")
    splits = {s: clean_split(args.root, s) for s in ("train", "dev", "test")}

    # the reference seeds the label dict with '_' and the full a-z
    # alphabet BEFORE scanning transcripts (data/aishell.py:283-289), so
    # its label files always contain every English letter even when the
    # corpus is missing some — and the lang pass keeps accumulating into
    # the SAME dict (:360-407), making aishell_lang_labels.json a
    # superset of aishell_labels.json. Reproduce both for vocab-index
    # interop with reference-trained checkpoints.
    labels: dict = {"_": True}
    for char in "abcdefghijklmnopqrstuvwxyz":
        labels[char] = True
    for split, rows in splits.items():
        write_manifest(rows, os.path.join(
            args.manifest_dir, f"aishell_{split}_manifest.csv"),
            lang=False, labels=labels)
    write_labels(labels, os.path.join(args.labels_dir,
                                      "aishell_labels.json"))
    print(len(labels))

    for split, rows in splits.items():
        write_manifest(rows, os.path.join(
            args.manifest_dir, f"aishell_{split}_lang_manifest.csv"),
            lang=True, labels=labels)
    labels[CHINESE_TAG] = True
    labels[ENGLISH_TAG] = True
    write_labels(labels, os.path.join(args.labels_dir,
                                      "aishell_lang_labels.json"))
    print(len(labels))


if __name__ == "__main__":
    main()
