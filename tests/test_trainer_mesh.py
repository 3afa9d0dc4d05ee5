"""Trainer end-to-end under a data-parallel mesh (8 virtual CPU devices):
train + validation epochs must run with sharded batches and replicated
params (catches placement bugs the single-device path hides)."""

import functools

import jax
import numpy as np

from end2end_asr_tpu.config import Config, load_vocab
from end2end_asr_tpu.data.dataset import ManifestDataset
from end2end_asr_tpu.data.loader import AudioBatchLoader
from end2end_asr_tpu.models.transformer import init_transformer
from end2end_asr_tpu.parallel.mesh import make_mesh
from end2end_asr_tpu.training.optimizer import init_adam_state
from end2end_asr_tpu.training.trainer import Trainer
from tests.synth import make_corpus


def test_trainer_with_mesh(tmp_path):
    texts = ["ab", "ba", "abba", "baab", "aabb", "bbaa", "abab", "baba"]
    manifest, labels = make_corpus(str(tmp_path / "c"), texts=texts,
                                   exact_samples=63 * 160)
    cfg = Config(
        feat_extractor="", num_layers=1, num_heads=2, dim_model=32,
        dim_key=16, dim_value=16, dim_inner=64, dim_emb=32, batch_size=8,
        dropout=0.0, src_max_len=64, tgt_max_len=8, src_buckets=(64,),
        tgt_buckets=(8,), dtype="float32", epochs=1, save_every=100,
        parallel=True, save_folder=str(tmp_path), name="mesh")
    label2id, id2label = load_vocab(labels)
    ds = ManifestDataset([manifest], label2id)
    train_loader = AudioBatchLoader(ds, cfg)
    valid_loader = AudioBatchLoader(ds, cfg)

    params, state = jax.jit(functools.partial(
        init_transformer, cfg=cfg, num_vocab=len(label2id)))(
            jax.random.PRNGKey(0))
    opt = init_adam_state(params)

    mesh = make_mesh(8)
    trainer = Trainer(cfg, label2id, id2label, mesh=mesh)
    params, opt, state, metrics = trainer.train(
        params, opt, state, train_loader, [valid_loader],
        start_epoch=0, num_epochs=1, prefetch=True)
    assert np.isfinite(metrics["train_loss"])
    assert np.isfinite(metrics["valid_loss"])
