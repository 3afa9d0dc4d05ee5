"""int16 PCM wire format (--pcm-wire-dtype) must be EXACT for
WAV-sourced audio: the loader's quantization inverts the decoder's
int16/32768 normalization bit-for-bit, so device-side features from the
int16 wire equal the float32 wire's to the last ulp."""

import numpy as np

from end2end_asr_tpu.config import Config, load_vocab
from end2end_asr_tpu.data.dataset import ManifestDataset
from end2end_asr_tpu.data.loader import AudioBatchLoader, BucketingSampler
from end2end_asr_tpu.ops.features import batched_features, pcm_to_f32
from tests.synth import make_corpus


def _batch(corpus, labels, wire):
    cfg = Config(feat_extractor="", batch_size=4, src_max_len=64,
                 tgt_max_len=16, src_buckets=(64,), tgt_buckets=(16,),
                 shuffle=False, pcm_wire_dtype=wire)
    label2id, _ = load_vocab(labels)
    ds = ManifestDataset([corpus], label2id)
    loader = AudioBatchLoader(
        ds, cfg, sampler=BucketingSampler(len(ds), 4, seed=3), seed=3,
        num_workers=0)
    return cfg, next(iter(loader))


def test_int16_wire_bit_exact(tmp_path):
    manifest, labels = make_corpus(str(tmp_path / "c"),
                                   exact_samples=63 * 160)
    cfg, b16 = _batch(manifest, labels, "int16")
    _, b32 = _batch(manifest, labels, "float32")

    assert b16.pcm.dtype == np.int16
    assert b32.pcm.dtype == np.float32
    # quantization inverts the WAV decode exactly
    np.testing.assert_array_equal(
        np.asarray(pcm_to_f32(b16.pcm)), b32.pcm)

    f16 = batched_features(b16.pcm, b16.n_frames, cfg.n_fft,
                           cfg.hop_length, cfg.window, T_out=64)
    f32 = batched_features(b32.pcm, b32.n_frames, cfg.n_fft,
                           cfg.hop_length, cfg.window, T_out=64)
    np.testing.assert_array_equal(np.asarray(f16), np.asarray(f32))


def test_float_audio_quantization_bounded(tmp_path):
    # non-WAV-sourced floats round to the nearest int16 — same as the
    # reference's sox-tempfile WAV round trip (utils/audio.py:22-45)
    x = np.linspace(-0.99, 0.99, 501, dtype=np.float32)[None]
    q = np.clip(np.rint(x * 32768.0), -32768, 32767).astype(np.int16)
    back = np.asarray(pcm_to_f32(q))
    assert np.max(np.abs(back - x)) <= 0.5 / 32768.0 + 1e-9