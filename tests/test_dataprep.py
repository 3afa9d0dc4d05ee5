"""Dataset-preparation utilities: cleaners, manifests, labels."""

import json
import os

import numpy as np

from dataprep.text import (add_lang, preprocess, separate_chinese_chars,
                           CHINESE_TAG, ENGLISH_TAG)
from dataprep.utils import (create_manifest, generate_label_from_corpora,
                            order_and_prune_files)
from end2end_asr_tpu.data.audio import save_wav


def test_preprocess_cleaning():
    assert preprocess("Hello, WORLD!") == "hello world"
    assert preprocess("好的(嗯)谢谢") == "好的谢谢"      # bracketed hesitation
    assert preprocess("a  b   c") == "a b c"             # space collapse
    # reference collapses " ' " before the contraction fixes run
    # (data/aishell.py:33,64), so "it ' s" ends as "it s"
    assert preprocess("it ' s fine.") == "it s fine"
    assert preprocess("don'r work") == "don't work"
    assert preprocess("你好。世界！") == "你好 世界"


def test_add_lang_and_char_separation():
    tagged = add_lang("你好 world 再见")
    assert tagged.split(" ")[0].startswith(CHINESE_TAG)
    assert ENGLISH_TAG in tagged
    sep = separate_chinese_chars("你好 world")
    assert sep == "你 好 world"


def test_create_manifest_sorted_and_pruned(tmp_path):
    wav_dir = tmp_path / "wav"
    txt_dir = tmp_path / "txt"
    wav_dir.mkdir()
    txt_dir.mkdir()
    sr = 16000
    durations = [2.0, 0.5, 1.0, 20.0]
    for i, d in enumerate(durations):
        save_wav(str(wav_dir / f"u{i}.wav"),
                 np.zeros(int(d * sr), np.float32), sr)
        (txt_dir / f"u{i}.txt").write_text(f"text {i}")
    out = tmp_path / "manifest.csv"
    create_manifest(str(tmp_path), str(out), min_duration=1,
                    max_duration=15)
    rows = out.read_text().strip().split("\n")
    names = [r.split(",")[0].split("/")[-1] for r in rows]
    # 0.5s and 20s pruned; remaining sorted ascending by duration
    assert names == ["u2.wav", "u0.wav"]
    assert rows[0].split(",")[1].endswith("txt/u2.txt")


def test_generate_labels(tmp_path):
    (tmp_path / "a.txt").write_text("Hello\nWorld")
    out = tmp_path / "labels.json"
    labels = generate_label_from_corpora([str(tmp_path / "a.txt")],
                                         output_path=str(out))
    assert set("helo wrd") <= set(labels)
    assert "H" not in labels  # lowercased
    assert json.loads(out.read_text()) == labels


def test_aishell_prep_end_to_end(tmp_path):
    # synth an AiShell-layout corpus: wav + raw transcripts
    root = tmp_path / "Aishell_dataset"
    for split in ("train", "dev", "test"):
        for spk in ("S1",):
            (root / "transcript" / split / spk).mkdir(parents=True)
            (root / "wav" / split / spk).mkdir(parents=True)
            for i, text in enumerate(["你好 WORLD (嗯)", "再见 了"]):
                (root / "transcript" / split / spk /
                 f"u{i}.txt").write_text(text)
                save_wav(str(root / "wav" / split / spk / f"u{i}.wav"),
                         np.zeros(1600, np.float32), 16000)

    import subprocess
    import sys
    r = subprocess.run(
        [sys.executable, os.path.join(os.path.dirname(__file__), "..",
                                      "dataprep", "aishell.py"),
         "--root", str(root), "--manifest-dir", str(tmp_path / "manifests"),
         "--labels-dir", str(tmp_path / "labels")],
        capture_output=True, text=True, timeout=120)
    assert r.returncode == 0, r.stderr[-1000:]

    for split in ("train", "dev", "test"):
        m = tmp_path / "manifests" / f"aishell_{split}_manifest.csv"
        rows = m.read_text().strip().split("\n")
        assert len(rows) == 2
        wav, txt = rows[0].split(",")
        assert os.path.isfile(wav) and os.path.isfile(txt)
        content = open(txt, encoding="utf-8").read().strip()
        assert "(" not in content and content == content.lower()

    labels = json.loads((tmp_path / "labels" /
                         "aishell_labels.json").read_text())
    assert labels[0] == "_" and labels[-1] == " "
    assert "你" in labels

    lang_labels = json.loads((tmp_path / "labels" /
                              "aishell_lang_labels.json").read_text())
    assert CHINESE_TAG in lang_labels and ENGLISH_TAG in lang_labels
    lang_m = (tmp_path / "manifests" /
              "aishell_train_lang_manifest.csv").read_text().strip()
    lang_txt = lang_m.split("\n")[0].split(",")[1]
    assert CHINESE_TAG in open(lang_txt, encoding="utf-8").read()
