"""Multi-valid-loader semantics.

1. Trainer reproduces the reference's best-model quirk DELIBERATELY:
   `valid_loss` (and the best-model decision) key off the LAST valid
   loader only — trainer/asr/trainer.py:189-208 leaks the loop variable
   out of `for valid_loader in valid_loader_list`.
2. MultiTrainer (multi_train.py) restores the ghost MultiTrainer's
   contract (trainer/asr/__pycache__/multi_trainer.cpython-35.pyc
   strings): per-TASK valid log lines and a `valid_losses` metrics list,
   best keyed on the aggregate.
"""

import functools
import logging

import jax
import numpy as np
import pytest

from end2end_asr_tpu.config import Config, load_vocab
from end2end_asr_tpu.data.dataset import ManifestDataset
from end2end_asr_tpu.data.loader import AudioBatchLoader
from end2end_asr_tpu.models.transformer import init_transformer
from end2end_asr_tpu.training.optimizer import init_adam_state
from end2end_asr_tpu.training.trainer import MultiTrainer, Trainer
from tests.synth import make_corpus


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    tmp_path = tmp_path_factory.mktemp("mv")
    # two "tasks": valid set B has much longer transcripts than A, so the
    # per-loader teacher-forced losses reliably differ
    m_a, labels = make_corpus(str(tmp_path / "a"), texts=["ab", "ba"],
                              exact_samples=63 * 160)
    m_b, _ = make_corpus(str(tmp_path / "b"),
                         texts=["abbabbab", "babbabba"],
                         exact_samples=63 * 160)
    cfg = Config(
        feat_extractor="", num_layers=1, num_heads=2, dim_model=32,
        dim_key=16, dim_value=16, dim_inner=64, dim_emb=32, batch_size=2,
        dropout=0.0, src_max_len=64, tgt_max_len=12, src_buckets=(64,),
        tgt_buckets=(12,), dtype="float32", epochs=1, save_every=100,
        save_folder=str(tmp_path), name="mv")
    label2id, id2label = load_vocab(labels)
    params, state = jax.jit(functools.partial(
        init_transformer, cfg=cfg, num_vocab=len(label2id)))(
            jax.random.PRNGKey(0))

    def loaders():
        tr = AudioBatchLoader(ManifestDataset([m_a], label2id), cfg)
        va = AudioBatchLoader(ManifestDataset([m_a], label2id), cfg)
        vb = AudioBatchLoader(ManifestDataset([m_b], label2id), cfg)
        return tr, [va, vb]

    return cfg, label2id, id2label, params, state, loaders


def _run(trainer, params, state, loaders):
    # the train step donates params/opt/state buffers — copy so the
    # module-scoped fixture survives multiple runs
    params = jax.tree_util.tree_map(lambda x: x.copy(), params)
    state = jax.tree_util.tree_map(lambda x: x.copy(), state)
    tr, valid_list = loaders()
    opt = init_adam_state(params)
    return trainer.train(params, opt, state, tr, valid_list,
                         start_epoch=0, num_epochs=1, prefetch=False)


def test_best_model_keys_off_last_valid_loader(setup, caplog):
    cfg, label2id, id2label, params, state, loaders = setup
    with caplog.at_level(logging.INFO, logger="end2end_asr_tpu"):
        *_, metrics = _run(Trainer(cfg, label2id, id2label),
                           params, state, loaders)
    # recover the two per-loader losses from the VALID SET lines
    per_set = {}
    for rec in caplog.records:
        if "VALID SET" in rec.getMessage():
            msg = rec.getMessage()
            ind = int(msg.split("VALID SET ")[1].split(" ")[0])
            per_set[ind] = float(msg.split("LOSS:")[1].split(" ")[0])
    assert set(per_set) == {0, 1}
    assert abs(per_set[0] - per_set[1]) > 1e-4  # the quirk is observable
    # quirk: metrics['valid_loss'] is the LAST loader's loss, not a mean
    assert metrics["valid_loss"] == pytest.approx(per_set[1], abs=1e-4)
    assert "valid_losses" not in metrics


def test_multitrainer_per_task_lines_and_metrics(setup, caplog):
    cfg, label2id, id2label, params, state, loaders = setup
    with caplog.at_level(logging.INFO, logger="end2end_asr_tpu"):
        *_, metrics = _run(MultiTrainer(cfg, label2id, id2label),
                           params, state, loaders)
    task_lines = [rec.getMessage() for rec in caplog.records
                  if "TASK:" in rec.getMessage()]
    assert len(task_lines) == 2
    assert "TASK:0 VALID LOSS:" in task_lines[0]
    assert "TASK:1 VALID LOSS:" in task_lines[1]
    assert len(metrics["valid_losses"]) == 2
    assert metrics["valid_loss"] == pytest.approx(
        float(np.mean(metrics["valid_losses"])), abs=1e-6)
