"""Checkpoint averaging (tools/average_checkpoints.py): uniform param
average over K checkpoints, loadable by test.py --continue-from. Beyond
the reference (its best_model is a single epoch's weights)."""

import sys

import numpy as np
import pytest

from end2end_asr_tpu.config import Config
from end2end_asr_tpu.training.checkpoint import (load_checkpoint,
                                                 save_checkpoint)
from tools.average_checkpoints import average_trees, main


def _params(scale):
    return {"enc": {"w": np.full((4, 4), scale, np.float32),
                    "b": np.full((4,), scale, np.float32)},
            "emb": np.arange(8, dtype=np.float32) * scale}


def test_average_trees_uniform():
    avg = average_trees([_params(1.0), _params(3.0)])
    np.testing.assert_allclose(avg["enc"]["w"],
                               np.full((4, 4), 2.0, np.float32))
    np.testing.assert_allclose(avg["emb"],
                               np.arange(8, dtype=np.float32) * 2.0)


def test_average_trees_rejects_mismatched_structure():
    other = {"enc": {"w": np.zeros((4, 4), np.float32)}}
    with pytest.raises(ValueError):
        average_trees([_params(1.0), other])


def test_cli_roundtrip(tmp_path, monkeypatch):
    cfg = Config()
    state = {"bn": {"mean": np.full(3, 1.0, np.float32)}}
    for i, scale in enumerate((1.0, 2.0, 6.0)):
        st = {"bn": {"mean": state["bn"]["mean"] * scale}}
        save_checkpoint(str(tmp_path / f"ep{i}"), cfg, i + 1,
                        _params(scale), {"step": np.int32(i)}, st,
                        {"a": 3}, {3: "a"})
    out = str(tmp_path / "avg")
    monkeypatch.setattr(sys, "argv", [
        "average_checkpoints.py", out,
        str(tmp_path / "ep0"), str(tmp_path / "ep1"),
        str(tmp_path / "ep2")])
    main()

    _, epoch, params, opt, st, label2id, id2label, metrics = \
        load_checkpoint(out)
    assert epoch == 3
    assert opt is None  # optimizer state dropped on purpose
    np.testing.assert_allclose(params["enc"]["w"],
                               np.full((4, 4), 3.0, np.float32))
    np.testing.assert_allclose(st["bn"]["mean"], np.full(3, 3.0))
    assert metrics["averaged_from"] == [str(tmp_path / f"ep{i}")
                                        for i in range(3)]
    assert id2label == {3: "a"}
