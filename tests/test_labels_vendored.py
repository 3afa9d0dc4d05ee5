"""Vendored label files (data/labels/) + default-path fallback.

The reference ships its label inventories in-tree
(/root/reference/data/labels/labels.json — 29-char English set — and
aishell_labels.json, 4361 chars) and a user with ready manifests trains
without any dataprep pre-step. We vendor the same files and make the
bare ``--labels-path labels.json`` default resolve to them.
"""

import json
import os
import subprocess
import sys

import pytest

from end2end_asr_tpu.config import (build_vocab, load_vocab,
                                    resolve_labels_path)
from tests.synth import make_corpus

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_vendored_files_exist_and_parse():
    eng = json.load(open(os.path.join(REPO, "data/labels/labels.json")))
    assert eng[0] == "_" and eng[-1] == " " and len(eng) == 29
    assert [c for c in eng if len(c) == 1 and c.isalpha()] == \
        [chr(c) for c in range(ord("a"), ord("z") + 1)]
    ais = json.load(open(os.path.join(REPO,
                                      "data/labels/aishell_labels.json")))
    assert ais[0] == "_" and ais[-1] == " " and len(ais) > 4000
    assert len(set(ais)) == len(ais)  # no duplicate chars


def test_resolve_falls_back_to_vendored(tmp_path, monkeypatch):
    # bare default filename, cwd has no labels.json -> vendored file
    monkeypatch.chdir(tmp_path)
    p = resolve_labels_path("labels.json")
    assert os.path.isabs(p) and p.endswith("data/labels/labels.json")
    label2id, id2label = load_vocab("labels.json")
    # PAD/SOS/EOS prepended, then _, ', a..z, space (train.py:44-57)
    assert label2id["a"] == 5 and label2id[" "] == 31
    assert len(label2id) == 32

    # an existing local file always wins over the vendored one
    local = tmp_path / "labels.json"
    local.write_text(json.dumps(["x", "y"]))
    assert resolve_labels_path("labels.json") == "labels.json"

    # a missing non-vendored name passes through untouched
    assert resolve_labels_path("nope_123.json") == "nope_123.json"


def test_aishell_vocab_builds():
    label2id, id2label = load_vocab(
        os.path.join(REPO, "data/labels/aishell_labels.json"))
    # 3 specials + 4361 chars, all round-trip
    assert len(label2id) == 3 + 4361
    assert all(id2label[i] in label2id for i in range(len(id2label)))


@pytest.mark.slow
def test_train_cli_default_labels(tmp_path):
    """CLI smoke: train with NO --labels-path on an English-charset
    synthetic manifest — the vendored labels.json must be picked up."""
    manifest, _ = make_corpus(str(tmp_path / "c"), exact_samples=63 * 160)
    env = dict(os.environ, JAX_PLATFORMS="cpu",
               PYTHONPATH=REPO + os.pathsep +
               os.environ.get("PYTHONPATH", ""))
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "train.py"),
         "--train-manifest-list", manifest,
         "--valid-manifest-list", manifest,
         "--name", "deflabels", "--save-folder", "models",
         "--feat_extractor", "", "--num-layers", "1", "--num-heads", "2",
         "--dim-model", "64", "--dim-key", "16", "--dim-value", "16",
         "--dim-inner", "128", "--dim-emb", "64", "--batch-size", "4",
         "--dropout", "0.0", "--dtype", "float32",
         "--src-max-len", "128", "--tgt-max-len", "16",
         "--epochs", "1", "--save-every", "1"],
        cwd=str(tmp_path), env=env, capture_output=True, text=True,
        timeout=420)
    assert r.returncode == 0, r.stderr[-2000:]
    assert (tmp_path / "models" / "deflabels" / "epoch_1.npz").exists()
