"""Mixed-duration corpora produce several static bucket shapes; one
train-step function must serve all of them (recompile per spect_T/target
width, numerics independent of padding amount)."""

import functools

import jax
import numpy as np

from end2end_asr_tpu.config import Config, load_vocab
from end2end_asr_tpu.data.dataset import ManifestDataset
from end2end_asr_tpu.data.loader import AudioBatchLoader, BucketingSampler
from end2end_asr_tpu.models.transformer import dims_from_config, init_transformer
from end2end_asr_tpu.training.optimizer import init_adam_state
from end2end_asr_tpu.training.steps import make_eval_step, make_train_step
from tests.synth import make_corpus


def test_two_buckets_one_step_fn(tmp_path):
    # 2 short + 2 long utterances → buckets 64 and 128
    import json
    from end2end_asr_tpu.data.audio import save_wav
    rng = np.random.RandomState(0)
    wav_dir = tmp_path / "wav"
    txt_dir = tmp_path / "txt"
    wav_dir.mkdir()
    txt_dir.mkdir()
    rows = []
    for i, (n, text) in enumerate([(63 * 160, "ab"), (63 * 160, "ba"),
                                   (120 * 160, "abab"), (120 * 160, "bb")]):
        save_wav(str(wav_dir / f"u{i}.wav"),
                 rng.randn(n).astype(np.float32) * 0.1, 16000)
        (txt_dir / f"u{i}.txt").write_text(text)
        rows.append(f"{wav_dir}/u{i}.wav,{txt_dir}/u{i}.txt")
    manifest = tmp_path / "m.csv"
    manifest.write_text("\n".join(rows) + "\n")
    labels = tmp_path / "labels.json"
    labels.write_text(json.dumps(["a", "b"]))

    cfg = Config(batch_size=2, src_buckets=(64, 128), tgt_buckets=(8,),
                 src_max_len=128, tgt_max_len=8, feat_extractor="",
                 num_layers=1, num_heads=2, dim_model=32, dim_key=16,
                 dim_value=16, dim_inner=64, dim_emb=32, dropout=0.0,
                 dtype="float32")
    label2id, _ = load_vocab(str(labels))
    ds = ManifestDataset([str(manifest)], label2id)
    loader = AudioBatchLoader(
        ds, cfg, sampler=BucketingSampler(len(ds), 2, seed=0))

    batches = list(loader)
    assert sorted(b.src_bucket for b in batches) == [64, 128]

    dims = dims_from_config(cfg)
    params, state = jax.jit(functools.partial(
        init_transformer, cfg=cfg, num_vocab=len(label2id)))(
            jax.random.PRNGKey(0))
    opt = init_adam_state(params)
    step = make_train_step(cfg, dims, from_pcm=True)
    eval_step = make_eval_step(cfg, dims, from_pcm=True)
    rng_j = jax.random.PRNGKey(1)
    for batch in batches:
        rng_j, sub = jax.random.split(rng_j)
        params, opt, state, m, _, _ = step(
            params, opt, state, sub, batch.pcm, batch.n_frames,
            batch.targets, batch.tgt_lengths, spect_T=batch.src_bucket)
        assert np.isfinite(float(m["loss"]))
        loss, _, _ = eval_step(params, state, batch.pcm, batch.n_frames,
                               batch.targets, batch.tgt_lengths,
                               spect_T=batch.src_bucket)
        assert np.isfinite(float(loss))
