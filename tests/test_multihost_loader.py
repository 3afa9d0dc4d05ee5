"""Multi-host input sharding: each process builds only its local slice
of every batch; bucket shapes are derived from WAV headers/transcripts of
the FULL bin so all processes agree, and the concatenation of local
shards equals the single-process global batch (parallel/mesh.py
put_sharded assembles them via make_array_from_process_local_data)."""

import jax
import numpy as np

from end2end_asr_tpu.config import Config, load_vocab
from end2end_asr_tpu.data.dataset import ManifestDataset
from end2end_asr_tpu.data.loader import AudioBatchLoader, BucketingSampler
from end2end_asr_tpu.parallel.mesh import batch_sharded, make_mesh
from tests.synth import make_corpus

P = 4  # simulated process count


def _cfg(tmp):
    return Config(feat_extractor="", batch_size=8, src_max_len=128,
                  tgt_max_len=16, src_buckets=(64, 128),
                  tgt_buckets=(8, 16), dtype="float32",
                  save_folder=str(tmp))


def test_local_shards_concatenate_to_global_batch(tmp_path):
    texts = ["ab", "ba", "abba", "baab", "aabb", "bbaa", "abab", "baba"]
    manifest, labels = make_corpus(str(tmp_path / "c"), texts=texts,
                                   exact_samples=63 * 160)
    cfg = _cfg(tmp_path)
    label2id, _ = load_vocab(labels)

    def loader(idx, cnt):
        ds = ManifestDataset([manifest], label2id)
        return AudioBatchLoader(
            ds, cfg,
            sampler=BucketingSampler(len(ds), cfg.batch_size, seed=5),
            seed=5, num_workers=1, process_index=idx, process_count=cnt)

    global_batches = list(loader(0, 1))
    shards = [list(loader(p, P)) for p in range(P)]

    for bi, gb in enumerate(global_batches):
        locs = [shards[p][bi] for p in range(P)]
        # identical bucket shapes on every process
        assert all(l.src_bucket == gb.src_bucket for l in locs)
        assert all(l.targets.shape[1] == gb.targets.shape[1] for l in locs)
        assert all(l.pcm.shape[0] == gb.pcm.shape[0] // P for l in locs)
        np.testing.assert_array_equal(
            np.concatenate([l.pcm for l in locs]), gb.pcm)
        np.testing.assert_array_equal(
            np.concatenate([l.targets for l in locs]), gb.targets)
        np.testing.assert_array_equal(
            np.concatenate([l.n_frames for l in locs]), gb.n_frames)


def test_ragged_bin_pads_by_cycling(tmp_path):
    # 6 utterances, batch 8 → one ragged bin of 6; each of 4 processes
    # must still hold 6//4→2 rows (padded by cycling), total 8
    texts = ["ab", "ba", "abba", "baab", "aabb", "bbaa"]
    manifest, labels = make_corpus(str(tmp_path / "c"), texts=texts,
                                   exact_samples=63 * 160)
    cfg = _cfg(tmp_path)
    label2id, _ = load_vocab(labels)
    for p in range(P):
        ds = ManifestDataset([manifest], label2id)
        ld = AudioBatchLoader(ds, cfg, seed=5, num_workers=1,
                              process_index=p, process_count=P)
        (batch,) = list(ld)
        assert batch.pcm.shape[0] == 2


def test_put_sharded_api_on_virtual_mesh(tmp_path):
    # single-process degenerate case of the pod input path: the
    # make_array_from_process_local_data construction must equal a plain
    # sharded device_put on the 8-device CPU mesh
    mesh = make_mesh(8)
    arr = np.arange(8 * 6, dtype=np.float32).reshape(8, 6)
    sh = batch_sharded(mesh, 2)
    a1 = jax.make_array_from_process_local_data(sh, arr)
    a2 = jax.device_put(arr, sh)
    assert a1.sharding.is_equivalent_to(a2.sharding, a1.ndim)
    np.testing.assert_array_equal(np.asarray(a1), np.asarray(a2))


def test_global_buckets_with_augment_margin(tmp_path):
    # augment=True widens the header-derived frame bound by 1/0.85 so a
    # tempo-stretched utterance can never exceed the agreed bucket
    manifest, labels = make_corpus(str(tmp_path / "c"),
                                   texts=["ab", "ba"],
                                   exact_samples=63 * 160)
    label2id, _ = load_vocab(labels)
    cfg = _cfg(tmp_path)
    ds = ManifestDataset([manifest], label2id, augment=True)
    ld = AudioBatchLoader(ds, cfg, seed=5, num_workers=1,
                          process_index=0, process_count=2)
    t_b, u_b = ld._global_buckets([0, 1])
    # 64 frames * 1/0.85 → next bucket up
    assert t_b == 128
    for batch in ld:
        assert batch.src_bucket == 128
        assert batch.pcm.shape[0] == 1
