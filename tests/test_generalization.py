"""End-to-end GENERALIZATION (not memorization): train on a synthetic
tone language — each character is a 120ms pure tone at a distinct
frequency — and require near-zero CER greedy-decoding UNSEEN sequences.
Exercises the full pipeline: WAV → bucketed loader → on-device features →
conv-free encoder-decoder → KV-cached greedy decode → CER."""

import functools
import itertools

import jax
import numpy as np
import pytest

from end2end_asr_tpu.config import Config, load_vocab
from end2end_asr_tpu.data.audio import save_wav
from end2end_asr_tpu.data.dataset import ManifestDataset
from end2end_asr_tpu.data.loader import AudioBatchLoader
from end2end_asr_tpu.decoding.greedy import greedy_decode, ids_to_strings
from end2end_asr_tpu.models.transformer import (dims_from_config, encode,
                                                init_transformer)
from end2end_asr_tpu.training.optimizer import init_adam_state
from end2end_asr_tpu.training.steps import make_encode_fn, make_train_step
from end2end_asr_tpu.training.trainer import strip_specials
from end2end_asr_tpu.utils.metrics import calculate_cer

SR = 16000
CHARS = "abcdefgh"
TONE_MS = 120
FREQS = {c: 350.0 + 150.0 * i for i, c in enumerate(CHARS)}


def synth_tone_utt(text: str, rng: np.random.RandomState) -> np.ndarray:
    n = int(TONE_MS / 1000 * SR)
    parts = []
    for ch in text:
        t = np.arange(n) / SR
        tone = 0.4 * np.sin(2 * np.pi * FREQS[ch] * t)
        parts.append(tone)
    y = np.concatenate(parts) + 0.02 * rng.randn(n * len(text))
    return y.astype(np.float32)


def make_tone_corpus(root, texts, seed=0):
    import json
    import os
    rng = np.random.RandomState(seed)
    os.makedirs(f"{root}/wav", exist_ok=True)
    os.makedirs(f"{root}/txt", exist_ok=True)
    rows = []
    for i, text in enumerate(texts):
        wav = f"{root}/wav/u{i}.wav"
        txt = f"{root}/txt/u{i}.txt"
        save_wav(wav, synth_tone_utt(text, rng), SR)
        with open(txt, "w") as f:
            f.write(text)
        rows.append(f"{wav},{txt}")
    with open(f"{root}/manifest.csv", "w") as f:
        f.write("\n".join(rows) + "\n")
    with open(f"{root}/labels.json", "w") as f:
        json.dump(sorted(set(CHARS)), f)
    return f"{root}/manifest.csv", f"{root}/labels.json"


@pytest.mark.slow
def test_tone_language_generalization(tmp_path):
    rng = np.random.RandomState(42)
    all_seqs = ["".join(s) for s in itertools.product(CHARS, repeat=3)]
    rng.shuffle(all_seqs)
    train_texts = all_seqs[:160]
    test_texts = all_seqs[160:180]  # disjoint from train

    train_manifest, labels = make_tone_corpus(
        str(tmp_path / "train"), train_texts, seed=1)
    test_manifest, _ = make_tone_corpus(
        str(tmp_path / "test"), test_texts, seed=2)

    cfg = Config(
        feat_extractor="", num_layers=2, num_heads=4, dim_model=128,
        dim_key=32, dim_value=32, dim_inner=256, dim_emb=128, dim_input=161,
        batch_size=16, dropout=0.1, label_smoothing=0.0,
        src_max_len=64, tgt_max_len=8, warmup=10 ** 6, min_lr=2e-3,
        src_buckets=(40,), tgt_buckets=(8,), dtype="float32",
        ref_compat_masks=True)
    label2id, id2label = load_vocab(labels)
    dims = dims_from_config(cfg)

    train_ds = ManifestDataset([train_manifest], label2id)
    loader = AudioBatchLoader(train_ds, cfg, seed=7)

    params, state = jax.jit(functools.partial(
        init_transformer, cfg=cfg, num_vocab=len(label2id)))(
            jax.random.PRNGKey(0))
    opt = init_adam_state(params)
    step = make_train_step(cfg, dims, from_pcm=True)
    rng_j = jax.random.PRNGKey(1)

    for epoch in range(40):
        loader.shuffle(epoch)
        for batch in loader:
            rng_j, sub = jax.random.split(rng_j)
            params, opt, state, m, _, _ = step(
                params, opt, state, sub, batch.pcm, batch.n_frames,
                batch.targets, batch.tgt_lengths, spect_T=batch.src_bucket)
    final_loss = float(m["loss"])

    # decode the UNSEEN test set
    test_ds = ManifestDataset([test_manifest], label2id)
    test_loader = AudioBatchLoader(test_ds, cfg, batch_size=20, seed=8)
    encode_fn = make_encode_fn(cfg, dims, from_pcm=True)
    total_cer, total_char = 0, 0
    for batch in test_loader:
        enc_out, _ = encode_fn(params, state, batch.pcm, batch.n_frames,
                               spect_T=batch.src_bucket)
        ids = greedy_decode(params, enc_out, dims, max_len=6)
        hyps = [strip_specials(s) for s in ids_to_strings(ids, id2label)]
        for hyp, row in zip(hyps, np.asarray(batch.targets)):
            gold = strip_specials("".join(
                id2label[int(x)] for x in row if int(x) != 0))
            total_cer += calculate_cer(hyp, gold)
            total_char += len(gold)
    cer = total_cer / total_char * 100
    assert cer <= 5.0, (cer, final_loss)


@pytest.mark.slow
def test_vgg_frontend_trains(tmp_path):
    """The conv path end-to-end: a small vgg_cnn model must overfit a
    16-utterance tone corpus (loss well below the trivial floor and
    teacher-forced accuracy high) — catches conv/BN/reshape wiring bugs
    that forward-shape and parity tests can miss."""
    rng = np.random.RandomState(3)
    texts = ["".join(rng.choice(list(CHARS), 3)) for _ in range(16)]
    manifest, labels = make_tone_corpus(str(tmp_path / "c"), texts, seed=5)
    # smaller STFT (10ms window / 5ms hop → F=81) keeps CPU convs cheap
    cfg = Config(
        feat_extractor="vgg_cnn", window_size=0.01, window_stride=0.005,
        num_layers=1, num_heads=2, dim_model=64, dim_key=16, dim_value=16,
        dim_inner=128, dim_emb=64, batch_size=16, dropout=0.0,
        src_max_len=128, tgt_max_len=8, warmup=10 ** 6, min_lr=2e-3,
        src_buckets=(128,), tgt_buckets=(8,), dtype="float32")
    assert cfg.conv_dim_input() == (81 // 2 // 2) * 128
    label2id, id2label = load_vocab(labels)
    dims = dims_from_config(cfg)
    ds = ManifestDataset([manifest], label2id)
    loader = AudioBatchLoader(ds, cfg, seed=11)
    params, state = jax.jit(functools.partial(
        init_transformer, cfg=cfg, num_vocab=len(label2id)))(
            jax.random.PRNGKey(0))
    opt = init_adam_state(params)
    step = make_train_step(cfg, dims, from_pcm=True)
    rng_j = jax.random.PRNGKey(2)

    first_loss, acc = None, 0.0
    for it in range(60):
        for batch in loader:
            rng_j, sub = jax.random.split(rng_j)
            params, opt, state, m, hyp, gold = step(
                params, opt, state, sub, batch.pcm, batch.n_frames,
                batch.targets, batch.tgt_lengths, spect_T=batch.src_bucket)
            if first_loss is None:
                first_loss = float(m["loss"])
            acc = float(m["num_correct"]) / float(m["num_token"])
    assert float(m["loss"]) < first_loss * 0.5
    # ceiling: the EOS-masked decoder position (1 of 6 gold tokens per
    # utterance) gets uniform logits — max achievable accuracy is 5/6
    assert acc >= 0.83, acc
