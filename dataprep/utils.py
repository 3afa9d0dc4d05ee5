"""Manifest + label-file utilities for dataset preparation.

Behavioral contract with data/utils.py of the reference:
  * create_manifest: walk a tree for .wav files, read durations, sort
    ascending, optionally prune to [min, max] seconds, write CSV rows
    `abs_wav_path,abs_txt_path` where txt swaps /wav/→/txt/ (:84-110);
  * generate_label_from_corpora / retrieve_label_from_corpus: character
    set extraction from .txt corpora into a JSON list (:12-82).

Durations come from the in-process native WAV reader
(end2end_asr_tpu.data.audio.get_audio_length) instead of one `soxi -D`
subprocess per file.
"""

from __future__ import annotations

import json
import os
from typing import Iterable, List, Optional, Set

from end2end_asr_tpu.data.audio import get_audio_length

SPECIAL_SPACE_CHARACTERS = ["\n", "\t", "\r"]


def retrieve_label_from_corpus(corpus_path: str,
                               lower_case: bool = True) -> Set[str]:
    label_set: Set[str] = set()
    if os.path.isdir(corpus_path):
        for name in os.listdir(corpus_path):
            sub = os.path.join(corpus_path, name)
            if os.path.isdir(sub) or sub.endswith(".txt"):
                label_set |= retrieve_label_from_corpus(sub, lower_case)
    elif corpus_path.endswith(".txt"):
        with open(corpus_path, encoding="utf-8") as f:
            data = f.read()
        for c in SPECIAL_SPACE_CHARACTERS:
            data = data.replace(c, " ")
        if lower_case:
            data = data.lower()
        label_set |= set(data)
    return label_set


def generate_label_from_corpora(corpus_paths: Iterable[str],
                                output_path: Optional[str] = None,
                                lower_case: bool = True) -> List[str]:
    label_set: Set[str] = set()
    for p in corpus_paths:
        label_set |= retrieve_label_from_corpus(p, lower_case)
    label_list = list(label_set)
    if output_path:
        with open(output_path, "w", encoding="utf-8") as f:
            json.dump(label_list, f, ensure_ascii=False)
    return label_list


def order_and_prune_files(file_paths: List[str],
                          min_duration: Optional[float],
                          max_duration: Optional[float]) -> List[str]:
    print("Sorting manifests...")
    with_durations = [(p, get_audio_length(p)) for p in file_paths]
    if min_duration is not None and max_duration is not None:
        # `is not None`, not truthiness: min_duration=0 is a valid
        # "no lower bound" and must not disable the max cut
        print(f"Pruning manifests between {min_duration} and "
              f"{max_duration} seconds")
        with_durations = [(p, d) for p, d in with_durations
                          if min_duration <= d <= max_duration]
    with_durations.sort(key=lambda x: x[1])
    return [p for p, _ in with_durations]


def create_manifest(data_path: str, output_path: str,
                    min_duration: Optional[float] = None,
                    max_duration: Optional[float] = None) -> None:
    file_paths = [os.path.join(dp, f)
                  for dp, _, files in os.walk(data_path)
                  for f in files if f.endswith(".wav")]
    file_paths = order_and_prune_files(file_paths, min_duration,
                                       max_duration)
    with open(output_path, "w", encoding="utf-8") as out:
        for wav_path in file_paths:
            txt = wav_path.replace("/wav/", "/txt/").replace(".wav", ".txt")
            out.write(f"{os.path.abspath(wav_path)},"
                      f"{os.path.abspath(txt)}\n")
    print()


def write_labels_json(labels: Iterable[str], path: str,
                      extra: Iterable[str] = ()) -> None:
    """AiShell-style label JSON: leading '_', skip empty/'_'/space,
    trailing ' ' entry (data/aishell.py:336-359)."""
    ordered = [c for c in labels if c not in ("", "_", " ")]
    ordered += [c for c in extra if c not in ordered]
    out = ["_"] + ordered + [" "]
    with open(path, "w", encoding="utf-8") as f:
        json.dump(out, f, ensure_ascii=False, indent=0)
