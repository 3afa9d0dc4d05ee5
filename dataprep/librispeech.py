#!/usr/bin/env python3
"""LibriSpeech preparation CLI (reference: data/librispeech.py).

Downloads the openslr/12 tarballs, extracts, converts flac→16k mono wav,
writes per-utterance transcripts, and builds duration-sorted manifests
with [min,max]-duration pruning for train.

flac decode: prefers in-process soundfile/torchaudio if installed, falls
back to an external `sox`/`ffmpeg` binary; WAV duration and manifest
sorting use the in-process native reader (no soxi subprocess per file).
"""

from __future__ import annotations

import argparse
import os
import shutil
import subprocess
import sys
import tarfile
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dataprep.utils import create_manifest  # noqa: E402

LIBRI_SPEECH_URLS = {
    "train": ["http://www.openslr.org/resources/12/train-clean-100.tar.gz",
              "http://www.openslr.org/resources/12/train-clean-360.tar.gz",
              "http://www.openslr.org/resources/12/train-other-500.tar.gz"],
    "val": ["http://www.openslr.org/resources/12/dev-clean.tar.gz",
            "http://www.openslr.org/resources/12/dev-other.tar.gz"],
    "test_clean": ["http://www.openslr.org/resources/12/test-clean.tar.gz"],
    "test_other": ["http://www.openslr.org/resources/12/test-other.tar.gz"],
}


def _flac_to_wav(flac_path: str, wav_path: str, sample_rate: int) -> None:
    with open(flac_path, "rb") as f:
        magic = f.read(4)
    if magic == b"RIFF":
        # actually a WAV (some mirrors/preprocessed corpora ship wav under
        # the .flac name; also the offline test path): decode in-process
        import wave

        from end2end_asr_tpu.data.audio import (load_audio, resample,
                                                save_wav)
        with wave.open(flac_path, "rb") as w:
            sr = w.getframerate()
        save_wav(wav_path, resample(load_audio(flac_path), sr, sample_rate),
                 sample_rate)
        return
    try:
        import soundfile as sf
        data, sr = sf.read(flac_path)
        from end2end_asr_tpu.data.audio import resample, save_wav
        if data.ndim > 1:
            data = data.mean(axis=1)
        save_wav(wav_path, resample(data.astype("float32"), sr, sample_rate),
                 sample_rate)
        return
    except ImportError:
        pass
    for tool, cmd in (("sox", ["sox", flac_path, "-r", str(sample_rate),
                               "-b", "16", "-c", "1", wav_path]),
                      ("ffmpeg", ["ffmpeg", "-y", "-i", flac_path, "-ar",
                                  str(sample_rate), "-ac", "1", wav_path])):
        if shutil.which(tool):
            subprocess.run(cmd, check=True, capture_output=True)
            return
    raise RuntimeError(
        "no flac decoder available: install soundfile, sox or ffmpeg")


def _preprocess_transcript(phrase: str) -> str:
    return phrase.strip().lower()


def _process_file(wav_dir: str, txt_dir: str, base_filename: str,
                  root_dir: str, sample_rate: int) -> None:
    full_recording_path = os.path.join(root_dir, base_filename)
    wav_path = os.path.join(wav_dir, base_filename.replace(".flac", ".wav"))
    _flac_to_wav(full_recording_path, wav_path, sample_rate)

    txt_path = os.path.join(txt_dir, base_filename.replace(".flac", ".txt"))
    trans_file = os.path.join(
        root_dir, "-".join(base_filename.split("-")[:-1]) + ".trans.txt")
    with open(trans_file, encoding="utf-8") as f:
        transcriptions = {
            line.split()[0].split("-")[-1]: " ".join(line.split()[1:])
            for line in f.read().strip().split("\n")}
    key = base_filename.replace(".flac", "").split("-")[-1]
    with open(txt_path, "w", encoding="utf-8") as f:
        f.write(_preprocess_transcript(transcriptions[key]))


def main():
    parser = argparse.ArgumentParser(
        description="Processes and downloads LibriSpeech dataset.")
    parser.add_argument("--target-dir", default="LibriSpeech_dataset/")
    parser.add_argument("--sample-rate", default=16000, type=int)
    parser.add_argument("--files-to-use", type=str, default=",".join(
        u.split("/")[-1] for us in LIBRI_SPEECH_URLS.values() for u in us))
    parser.add_argument("--min-duration", default=1, type=int)
    parser.add_argument("--max-duration", default=15, type=int)
    parser.add_argument("--manifest-dir", default="manifests/")
    args = parser.parse_args()

    target_dl_dir = args.target_dir
    os.makedirs(target_dl_dir, exist_ok=True)
    os.makedirs(args.manifest_dir, exist_ok=True)
    files_to_dl = args.files_to_use.strip().split(",")

    for split_type, lst_libri_urls in LIBRI_SPEECH_URLS.items():
        split_dir = os.path.join(target_dl_dir, split_type)
        os.makedirs(split_dir, exist_ok=True)
        split_wav_dir = os.path.join(split_dir, "wav")
        os.makedirs(split_wav_dir, exist_ok=True)
        split_txt_dir = os.path.join(split_dir, "txt")
        os.makedirs(split_txt_dir, exist_ok=True)
        extracted_dir = os.path.join(split_dir, "LibriSpeech")
        if os.path.exists(extracted_dir):
            shutil.rmtree(extracted_dir)

        for url in lst_libri_urls:
            filename = url.split("/")[-1]
            # substring match like the reference (librispeech.py:81-82):
            # --files-to-use train-clean-100 matches the tarball URL
            if not any(f and f in url for f in files_to_dl):
                print(f"Skipping url: {url}")
                continue
            target_filename = os.path.join(split_dir, filename)
            if not os.path.exists(target_filename):
                print(f"Downloading {url}")
                urllib.request.urlretrieve(url, target_filename)
            print(f"Unpacking {filename}...")
            with tarfile.open(target_filename) as tar:
                tar.extractall(split_dir)
            print("Converting flac files to wav and extracting transcripts...")
            assert os.path.exists(extracted_dir), \
                f"Archive {filename} was not properly uncompressed."
            for root, _, files in os.walk(extracted_dir):
                for f in files:
                    if f.endswith(".flac"):
                        _process_file(split_wav_dir, split_txt_dir, f, root,
                                      args.sample_rate)
            print(f"Finished {url}")
            shutil.rmtree(extracted_dir)

        if split_type == "train":
            create_manifest(
                split_dir,
                os.path.join(args.manifest_dir,
                             f"libri_{split_type}_manifest.csv"),
                args.min_duration, args.max_duration)
        else:
            create_manifest(
                split_dir,
                os.path.join(args.manifest_dir,
                             f"libri_{split_type}_manifest.csv"))


if __name__ == "__main__":
    main()
