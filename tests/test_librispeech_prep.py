"""Offline e2e test for dataprep/librispeech.py (reference:
data/librispeech.py): a synthetic LibriSpeech-layout tarball is placed
where the downloader would put it (so no network is touched), and the
full pipeline — extract, decode, transcript extraction, duration-sorted
manifest with min/max pruning — runs for real. The 'flac' payloads are
RIFF files handled by _flac_to_wav's sniffing fallback (no flac codec in
this image)."""

import os
import subprocess
import sys
import tarfile

import numpy as np
import pytest

from end2end_asr_tpu.data.audio import save_wav

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SR = 16000


def _make_archive(split_dir, archive_name, utts):
    """utts: list of (speaker, chapter, idx, seconds, text)."""
    root = os.path.join(split_dir, "LibriSpeech_src")
    by_chapter = {}
    for spk, chap, idx, secs, text in utts:
        d = os.path.join(root, "LibriSpeech", "x", str(spk), str(chap))
        os.makedirs(d, exist_ok=True)
        base = f"{spk}-{chap}-{idx:04d}"
        y = (0.2 * np.sin(2 * np.pi * 440 *
                          np.arange(int(secs * SR)) / SR)).astype(np.float32)
        # wav content under the .flac name (RIFF-sniffed by _flac_to_wav)
        save_wav(os.path.join(d, base + ".flac"), y, SR)
        by_chapter.setdefault((spk, chap), []).append(
            (f"{spk}-{chap}-{idx:04d}", text))
    for (spk, chap), rows in by_chapter.items():
        d = os.path.join(root, "LibriSpeech", "x", str(spk), str(chap))
        with open(os.path.join(d, f"{spk}-{chap}.trans.txt"), "w") as f:
            for utt_id, text in rows:
                f.write(f"{utt_id} {text}\n")
    tar_path = os.path.join(split_dir, archive_name)
    with tarfile.open(tar_path, "w:gz") as tar:
        tar.add(os.path.join(root, "LibriSpeech"), arcname="LibriSpeech")
    return tar_path


@pytest.mark.slow
def test_librispeech_prep_offline(tmp_path):
    target = tmp_path / "LibriSpeech_dataset"
    manifests = tmp_path / "manifests"
    train_dir = target / "train"
    test_dir = target / "test_clean"
    train_dir.mkdir(parents=True)
    test_dir.mkdir(parents=True)

    # train: one utterance below --min-duration (pruned), two kept with
    # distinct durations (sorting check)
    _make_archive(str(train_dir), "train-clean-100.tar.gz", [
        (19, 198, 0, 0.4, "TOO SHORT"),
        (19, 198, 1, 2.5, "The Longer Utterance"),
        (26, 495, 0, 1.2, "A Short One"),
    ])
    _make_archive(str(test_dir), "test-clean.tar.gz", [
        (777, 1, 0, 1.0, "Evaluation Text"),
    ])

    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "dataprep", "librispeech.py"),
         "--target-dir", str(target) + "/",
         "--manifest-dir", str(manifests) + "/",
         "--files-to-use", "train-clean-100.tar.gz,test-clean.tar.gz",
         "--min-duration", "1", "--max-duration", "15"],
        capture_output=True, text=True, timeout=300,
        env=dict(os.environ, JAX_PLATFORMS="cpu",
                 PYTHONPATH=REPO + os.pathsep +
                 os.environ.get("PYTHONPATH", "")))
    assert r.returncode == 0, r.stderr[-2000:]
    assert "Skipping url" in r.stdout  # non-requested tarballs untouched

    train_manifest = manifests / "libri_train_manifest.csv"
    rows = [ln.split(",") for ln in
            train_manifest.read_text().strip().splitlines()]
    # the 0.4 s utterance is pruned by --min-duration 1
    assert len(rows) == 2
    # duration-sorted ascending: 1.2 s before 2.5 s
    assert "26-495-0000" in rows[0][0] and "19-198-0001" in rows[1][0]
    for wav_path, txt_path in rows:
        assert os.path.exists(wav_path) and wav_path.endswith(".wav")
        assert os.path.exists(txt_path)
    # transcripts lowercased (reference _preprocess_transcript)
    txt = open(rows[1][1]).read()
    assert txt == "the longer utterance"

    test_manifest = manifests / "libri_test_clean_manifest.csv"
    trows = [ln.split(",") for ln in
             test_manifest.read_text().strip().splitlines()]
    assert len(trows) == 1 and "777-1-0000" in trows[0][0]
    assert open(trows[0][1]).read() == "evaluation text"
