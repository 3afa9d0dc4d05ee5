"""Loader / bucketing / sampler behavior."""

import numpy as np

from end2end_asr_tpu.config import Config, PAD_TOKEN
from end2end_asr_tpu.data.dataset import ManifestDataset
from end2end_asr_tpu.data.loader import (AudioBatchLoader, BucketingSampler,
                                         Prefetcher, pick_bucket)
from tests.synth import make_corpus


def test_pick_bucket():
    ladder = (100, 200, 400)
    assert pick_bucket(1, ladder) == 100
    assert pick_bucket(100, ladder) == 100
    assert pick_bucket(101, ladder) == 200
    assert pick_bucket(999, ladder) == 400  # clamps at top


def test_bucketing_sampler_semantics():
    s = BucketingSampler(10, batch_size=3, seed=0)
    bins = list(s)
    assert [sorted(b) for b in bins] == [[0, 1, 2], [3, 4, 5], [6, 7, 8], [9]]
    order_before = [tuple(sorted(b)) for b in s.bins]
    s.shuffle(0)
    assert sorted(tuple(sorted(b)) for b in s.bins) == sorted(order_before)


def test_loader_batch_shapes_and_prefetcher(tmp_path):
    manifest, labels = make_corpus(str(tmp_path), exact_samples=63 * 160)
    from end2end_asr_tpu.config import load_vocab
    label2id, _ = load_vocab(labels)
    cfg = Config(batch_size=2, src_buckets=(64, 128), tgt_buckets=(8, 16),
                 src_max_len=128, tgt_max_len=16)
    ds = ManifestDataset([manifest], label2id)
    loader = AudioBatchLoader(ds, cfg)
    batches = list(loader)
    assert len(batches) == 2
    for b in batches:
        assert b.src_bucket == 64
        assert b.pcm.shape == (2, 63 * 160 + 320)
        assert b.targets.shape[1] in (8, 16)
        assert np.all(b.n_frames == 64)
        assert np.all(b.targets[0, b.tgt_lengths[0]:] == PAD_TOKEN)
        assert 0 < b.utt_seconds <= 2 * 0.63 + 1e-6

    # Prefetcher yields the same number of batches, device-resident
    got = list(Prefetcher(loader, to_device=True))
    assert len(got) == 2
    import jax
    assert isinstance(got[0].pcm, jax.Array)


def test_host_features_path(tmp_path):
    manifest, labels = make_corpus(str(tmp_path), exact_samples=63 * 160)
    from end2end_asr_tpu.config import load_vocab
    label2id, _ = load_vocab(labels)
    cfg = Config(batch_size=4, src_buckets=(64,), tgt_buckets=(16,),
                 src_max_len=64, tgt_max_len=16)
    ds = ManifestDataset([manifest], label2id)
    loader = AudioBatchLoader(ds, cfg, host_features=True)
    b = next(iter(loader))
    assert b.pcm is None and b.spect.shape == (4, 161, 64)
    # per-utterance normalization: ~zero mean, ~unit std over valid region
    for i in range(4):
        s = b.spect[i]
        assert abs(float(s.mean())) < 0.05
        assert 0.8 < float(s.std()) < 1.2


def test_pad_to_full_pads_ragged_final_bin(tmp_path):
    """Under a device mesh, ragged final bins (len(dataset) %
    batch_size) can't shard on the 'data' axis — pad_to_full cycles
    rows up to the full batch and marks the real prefix in
    Batch.real_rows (train.py/test.py set it whenever a mesh is on)."""
    manifest, labels = make_corpus(str(tmp_path), exact_samples=63 * 160)
    from end2end_asr_tpu.config import load_vocab
    label2id, _ = load_vocab(labels)
    # 4 utterances, batch 3 -> bins of 3 and 1
    cfg = Config(batch_size=3, src_buckets=(64,), tgt_buckets=(16,),
                 src_max_len=64, tgt_max_len=16)
    ds = ManifestDataset([manifest], label2id)

    loader = AudioBatchLoader(ds, cfg)
    ragged = list(loader)
    assert [b.targets.shape[0] for b in ragged] == [3, 1]
    assert all(b.real_rows in (-1, b.targets.shape[0]) or
               b.real_rows == b.targets.shape[0] for b in ragged)

    loader2 = AudioBatchLoader(ds, cfg)
    loader2.pad_to_full = True
    padded = list(loader2)
    assert [b.targets.shape[0] for b in padded] == [3, 3]
    assert padded[0].real_rows == 3
    assert padded[1].real_rows == 1
    # the padding rows are cycled copies of the real ones
    b = padded[1]
    np.testing.assert_array_equal(b.targets[1], b.targets[0])
    np.testing.assert_array_equal(b.targets[2], b.targets[0])
    np.testing.assert_array_equal(b.pcm[1], b.pcm[0])
    # full bins are untouched
    np.testing.assert_array_equal(padded[0].targets, ragged[0].targets)
