"""Resume semantics: checkpoint args win UNLESS a flag was explicitly
typed on the resume command line (train.py/test.py), architecture
fields always follow the checkpoint; bucket ladders auto-extend to
cover src/tgt_max_len (silent truncation guard)."""

import numpy as np

from end2end_asr_tpu.config import (ARCH_FIELDS, Config,
                                    explicit_cli_overrides)


def test_explicit_cli_overrides_only_typed_flags():
    got = explicit_cli_overrides(
        ["--grad-accum", "4", "--parallel", "--mesh-model", "2"])
    assert got == {"grad_accum": 4, "parallel": True, "mesh_model": 2}
    assert explicit_cli_overrides([]) == {}


def test_arch_fields_guard_model_shape():
    got = explicit_cli_overrides(["--num-layers", "6", "--grad-accum",
                                  "2"])
    runtime = {k: v for k, v in got.items() if k not in ARCH_FIELDS}
    assert runtime == {"grad_accum": 2}  # num_layers must not override


def test_bucket_ladder_autoextends_to_max_len():
    cfg = Config(src_max_len=8000, tgt_max_len=3000)
    assert cfg.src_buckets[-1] == 8000
    assert cfg.tgt_buckets[-1] == 3000
    # replace() re-runs the guard
    cfg2 = Config().replace(src_max_len=5000)
    assert cfg2.src_buckets[-1] == 5000
    # covered max_len leaves the ladder untouched
    assert Config(src_max_len=4000).src_buckets[-1] == 4000


def test_train_resume_honors_explicit_runtime_flags(tmp_path):
    """End-to-end: train 1 epoch, resume with --grad-accum 2 — the
    resumed run must actually use grad_accum 2 (previously the
    checkpoint's 1 silently won)."""
    import subprocess
    import sys

    import os
    env = {**os.environ, "JAX_PLATFORMS": "cpu",
           "PYTHONPATH": "/root/repo"}
    from tests.synth import make_corpus
    manifest, labels = make_corpus(str(tmp_path / "c"),
                                   exact_samples=63 * 160)
    base = ["--train-manifest-list", manifest,
            "--valid-manifest-list", manifest,
            "--labels-path", labels, "--name", "r1",
            "--save-folder", str(tmp_path / "m"),
            "--feat_extractor", "", "--num-layers", "1",
            "--num-heads", "2", "--dim-model", "32", "--dim-key", "16",
            "--dim-value", "16", "--dim-inner", "64", "--dim-emb", "32",
            "--batch-size", "4", "--save-every", "1",
            "--dtype", "float32"]
    r = subprocess.run([sys.executable, "/root/repo/train.py"] + base +
                       ["--epochs", "1"], env=env, cwd=str(tmp_path),
                       capture_output=True, text=True, timeout=600)
    assert r.returncode == 0, r.stdout + r.stderr

    r = subprocess.run(
        [sys.executable, "/root/repo/train.py"] + base +
        ["--epochs", "2", "--grad-accum", "2",
         "--continue-from", str(tmp_path / "m" / "r1" / "epoch_1")],
        env=env, cwd=str(tmp_path), capture_output=True, text=True,
        timeout=600)
    assert r.returncode == 0, r.stdout + r.stderr
    # the resumed checkpoint's embedded config must carry the override
    import json
    meta = json.loads((tmp_path / "m" / "r1" / "epoch_2.json")
                      .read_text(encoding="utf-8"))
    assert meta["args"]["grad_accum"] == 2
    # while architecture stays from the original checkpoint
    assert meta["args"]["num_layers"] == 1
