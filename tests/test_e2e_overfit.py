"""Minimum end-to-end slice: manifest → WAV decode → on-device features →
jitted train step (Noam/Adam) → greedy decode → CER — overfit a 4-utterance
synthetic corpus on CPU (the 'LibriSpeech test-clean mini'-class config
from BASELINE.json, SURVEY.md §7 step 3)."""

import functools
import logging

import jax
import numpy as np
import pytest

from end2end_asr_tpu.config import Config, load_vocab
from end2end_asr_tpu.data.dataset import ManifestDataset
from end2end_asr_tpu.data.loader import AudioBatchLoader
from end2end_asr_tpu.decoding.greedy import greedy_decode, ids_to_strings
from end2end_asr_tpu.models.transformer import dims_from_config, init_transformer
from end2end_asr_tpu.training.optimizer import init_adam_state
from end2end_asr_tpu.training.steps import make_encode_fn, make_train_step
from end2end_asr_tpu.training.trainer import Trainer, strip_specials

from tests.synth import TEXTS, make_corpus

pytestmark = pytest.mark.slow  # full-grad compiles / long e2e soak


def mini_cfg(manifest, labels):
    return Config(
        train_manifest_list=(manifest,), valid_manifest_list=(manifest,),
        labels_path=labels, feat_extractor="", num_layers=2, num_heads=4,
        dim_model=128, dim_key=32, dim_value=32, dim_inner=256, dim_emb=128,
        dim_input=161, batch_size=4, dropout=0.0, label_smoothing=0.0,
        # warmup pushed out so rate() = min_lr: constant 1e-3 Adam for the
        # tiny overfit problem
        src_max_len=256, tgt_max_len=32, warmup=10**6, k_lr=1.0, min_lr=1e-3,
        src_buckets=(64, 128, 256), tgt_buckets=(8, 16, 32),
        dtype="float32", epochs=1, save_every=1000, shuffle=False)


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    root = tmp_path_factory.mktemp("corpus")
    # 63*160 samples → exactly 64 frames = the smallest src bucket
    return make_corpus(str(root), exact_samples=63 * 160)


def test_overfit_and_greedy_decode(corpus):
    manifest, labels_path = corpus
    cfg = mini_cfg(manifest, labels_path)
    label2id, id2label = load_vocab(labels_path)
    dims = dims_from_config(cfg)

    dataset = ManifestDataset([manifest], label2id,
                              sample_rate=cfg.sample_rate)
    loader = AudioBatchLoader(dataset, cfg)

    params, state = jax.jit(functools.partial(
        init_transformer, cfg=cfg, num_vocab=len(label2id)))(
            jax.random.PRNGKey(0))
    opt_state = init_adam_state(params)

    step = make_train_step(cfg, dims, from_pcm=True)
    rng = jax.random.PRNGKey(1)

    first_loss, last_loss = None, None
    for it in range(400):
        for batch in loader:
            rng, sub = jax.random.split(rng)
            params, opt_state, state, m, hyp, gold = step(
                params, opt_state, state, sub, batch.pcm, batch.n_frames,
                batch.targets, batch.tgt_lengths, spect_T=batch.src_bucket)
            loss = float(m["loss"])
            if first_loss is None:
                first_loss = loss
            last_loss = loss

    # Irreducible loss floor from the reference's EOS-as-pad quirk
    # (transformer.py:263,282-285): the decoder position holding the real
    # trailing EOS is zeroed by the non-pad mask, so its target (the
    # appended second EOS) gets uniform logits — log(V) per utterance.
    V = len(label2id)
    total_out_tokens = sum(len(t) + 3 for t in TEXTS)  # SOS+chars+EOS +EOS
    floor = np.log(V) * len(TEXTS) / total_out_tokens
    assert last_loss < first_loss * 0.25, (first_loss, last_loss)
    assert last_loss < floor + 0.05, (last_loss, floor)

    # greedy decode must reproduce the memorized transcripts
    encode_fn = make_encode_fn(cfg, dims, from_pcm=True)
    batch = next(iter(loader))
    enc_out, _ = encode_fn(params, state, batch.pcm, batch.n_frames,
                           spect_T=batch.src_bucket)
    ids = greedy_decode(params, enc_out, dims, max_len=16)
    hyps = [strip_specials(s) for s in ids_to_strings(ids, id2label)]

    golds = []
    for row in np.asarray(batch.targets):
        golds.append(strip_specials("".join(
            id2label[int(x)] for x in row if int(x) != 0)))
    assert sorted(hyps) == sorted(golds), (hyps, golds)

    # beam search must also recover the memorized transcripts (and
    # beam@1 follows the greedy argmax path by construction)
    from end2end_asr_tpu.decoding.beam import BeamDecoder
    for width in (1, 4):
        bcfg = cfg.replace(beam_search=True, beam_width=width, c_weight=0.1)
        beam = BeamDecoder(bcfg, dims, id2label)
        beam_hyps = [strip_specials(s) for s in beam.decode(params, enc_out)]
        assert sorted(beam_hyps) == sorted(golds), (width, beam_hyps, golds)

    # int8 weight-only PTQ (models/quantize.py) must preserve the
    # memorized transcripts through encode + greedy AND beam decode —
    # the offline stand-in for CER-neutrality on real data
    from end2end_asr_tpu.models.quantize import quantize_for_inference
    qparams = quantize_for_inference(params)
    q_enc, _ = encode_fn(qparams, state, batch.pcm, batch.n_frames,
                         spect_T=batch.src_bucket)
    q_ids = greedy_decode(qparams, q_enc, dims, max_len=16)
    q_hyps = [strip_specials(s) for s in ids_to_strings(q_ids, id2label)]
    assert sorted(q_hyps) == sorted(golds), (q_hyps, golds)
    bcfg = cfg.replace(beam_search=True, beam_width=4, c_weight=0.1)
    q_beam = [strip_specials(s)
              for s in BeamDecoder(bcfg, dims, id2label).decode(
                  qparams, q_enc)]
    assert sorted(q_beam) == sorted(golds), (q_beam, golds)


def test_trainer_epoch_runs_and_checkpoints(corpus, tmp_path):
    manifest, labels_path = corpus
    cfg = mini_cfg(manifest, labels_path).replace(
        save_folder=str(tmp_path), name="mini", epochs=1, save_every=1)
    label2id, id2label = load_vocab(labels_path)

    dataset = ManifestDataset([manifest], label2id)
    train_loader = AudioBatchLoader(dataset, cfg)
    valid_loader = AudioBatchLoader(dataset, cfg)

    params, state = jax.jit(functools.partial(
        init_transformer, cfg=cfg, num_vocab=len(label2id)))(
            jax.random.PRNGKey(0))
    opt_state = init_adam_state(params)

    trainer = Trainer(cfg, label2id, id2label)
    params, opt_state, state, metrics = trainer.train(
        params, opt_state, state, train_loader, [valid_loader],
        start_epoch=0, num_epochs=1, prefetch=False)
    assert "valid_loss" in metrics and np.isfinite(metrics["valid_loss"])

    # checkpoint written and loadable
    from end2end_asr_tpu.training.checkpoint import load_checkpoint
    base = f"{tmp_path}/mini/epoch_1"
    cfg2, epoch, p2, o2, s2, l2i, i2l, m2 = load_checkpoint(base)
    assert epoch == 1
    assert cfg2.dim_model == cfg.dim_model
    # loaded params numerically identical
    flat_a = jax.tree_util.tree_leaves(params)
    flat_b = jax.tree_util.tree_leaves(p2)
    assert all(np.allclose(a, b) for a, b in zip(flat_a, flat_b))
