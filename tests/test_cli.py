"""CLI surface smoke: train.py (fresh + --auto-resume) and test.py
(greedy + beam) as real subprocesses on a synthetic corpus."""

import os
import subprocess
import sys

import pytest

from tests.synth import make_corpus

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(args, cwd, timeout=420):
    env = dict(os.environ, JAX_PLATFORMS="cpu",
               PYTHONPATH=REPO + os.pathsep + os.environ.get("PYTHONPATH", ""))
    return subprocess.run([sys.executable] + args, cwd=cwd, env=env,
                          capture_output=True, text=True, timeout=timeout)


MODEL_FLAGS = ["--feat_extractor", "", "--num-layers", "1", "--num-heads",
               "2", "--dim-model", "64", "--dim-key", "16", "--dim-value",
               "16", "--dim-inner", "128", "--dim-emb", "64",
               "--batch-size", "4", "--dropout", "0.0",
               "--dtype", "float32", "--src-max-len", "128",
               "--tgt-max-len", "16"]


@pytest.mark.slow
def test_train_and_test_cli(tmp_path):
    manifest, labels = make_corpus(str(tmp_path / "c"),
                                   exact_samples=63 * 160)
    common = ["--train-manifest-list", manifest,
              "--valid-manifest-list", manifest,
              "--labels-path", labels, "--name", "smoke",
              "--save-folder", "models"] + MODEL_FLAGS

    r = _run([os.path.join(REPO, "train.py")] + common +
             ["--epochs", "2", "--save-every", "1"], cwd=str(tmp_path))
    assert r.returncode == 0, r.stderr[-2000:]
    assert (tmp_path / "models" / "smoke" / "epoch_2.npz").exists()
    log = (tmp_path / "log" / "smoke").read_text()
    assert "TRAIN LOSS" in log and "VALID SET 0" in log

    # auto-resume continues from epoch 2
    r = _run([os.path.join(REPO, "train.py")] + common +
             ["--epochs", "3", "--save-every", "1", "--auto-resume"],
             cwd=str(tmp_path))
    assert r.returncode == 0, r.stderr[-2000:]
    assert "AUTO-RESUME" in r.stdout
    assert (tmp_path / "models" / "smoke" / "epoch_3.npz").exists()

    for extra in ([], ["--beam-search", "--beam-width", "3"]):
        r = _run([os.path.join(REPO, "test.py"),
                  "--continue-from", "models/smoke/best_model",
                  "--test-manifest-list", manifest,
                  "--batch-size", "4"] + extra, cwd=str(tmp_path))
        assert r.returncode == 0, r.stderr[-2000:]
        assert "TEST CER:" in r.stdout

    # transcribe.py on one file
    wav = open(manifest).readline().split(",")[0]
    r = _run([os.path.join(REPO, "transcribe.py"),
              "--continue-from", "models/smoke/best_model", wav],
             cwd=str(tmp_path))
    assert r.returncode == 0, r.stderr[-2000:]
    assert wav in r.stdout
