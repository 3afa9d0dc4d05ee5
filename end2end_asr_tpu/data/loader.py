"""Bucketed batch loader with static shapes + host prefetch.

TPU-first inversion of the reference's pipeline: instead of dynamic
per-batch max-length padding computed in DataLoader worker processes
(utils/data_loader.py:182-214), batches are padded to a STATIC bucket
ladder (Config.src_buckets frames × Config.tgt_buckets tokens) so XLA
compiles a handful of programs, and the heavy feature math runs on device
(ops/features.py) from raw PCM.

BucketingSampler semantics preserved (utils/data_loader.py:223-243):
sequential index bins of batch_size over duration-sorted manifests,
shuffle WITHIN a bin every iteration, shuffle bin order on .shuffle(epoch).

A `Prefetcher` (worker threads — WAV decode is native C++ releasing the
GIL) keeps a queue of ready host batches in front of the device step.
"""

from __future__ import annotations

import queue
import threading
from dataclasses import dataclass
from typing import Iterator, List, Optional, Sequence

import numpy as np

from end2end_asr_tpu.config import Config, PAD_TOKEN
from end2end_asr_tpu.data.dataset import ManifestDataset
from end2end_asr_tpu.data.features import num_frames, parse_audio_features
from end2end_asr_tpu.ops.features import reflect_pad_pcm


class BucketingSampler:
    def __init__(self, n: int, batch_size: int, seed: int = 123456):
        ids = list(range(n))
        self.bins = [ids[i:i + batch_size]
                     for i in range(0, len(ids), batch_size)]
        self.rng = np.random.RandomState(seed)

    def __iter__(self) -> Iterator[List[int]]:
        for ids in self.bins:
            self.rng.shuffle(ids)
            yield list(ids)

    def __len__(self) -> int:
        return len(self.bins)

    def shuffle(self, epoch: int) -> None:
        self.rng.shuffle(self.bins)


@dataclass
class Batch:
    """Host-side batch. Exactly one of pcm/spect is set depending on
    whether features are computed on device (production) or host (oracle
    fallback)."""
    pcm: Optional[np.ndarray]          # (B, N + 2*pad) reflect-padded
    spect: Optional[np.ndarray]        # (B, F, T)
    n_frames: np.ndarray               # (B,) valid spectrogram frames
    src_bucket: int                    # T (frames after padding)
    targets: np.ndarray                # (B, U_bucket) PAD-padded, SOS…EOS
    tgt_lengths: np.ndarray            # (B,)
    src_percentages: np.ndarray        # (B,) frames / bucket (parity)
    utt_seconds: float                 # summed audio seconds (throughput)
    # rows [0:real_rows) are real; the tail (if any) is cycled padding
    # added so ragged final bins stay divisible by the device mesh
    # (pad_to_full below). -1 = all rows real.
    real_rows: int = -1


def pick_bucket(value: int, ladder: Sequence[int]) -> int:
    for b in ladder:
        if value <= b:
            return b
    return ladder[-1]


class AudioBatchLoader:
    """Iterates (possibly sampler-driven) batches of a ManifestDataset."""

    def __init__(self, dataset: ManifestDataset, cfg: Config,
                 sampler: Optional[BucketingSampler] = None,
                 batch_size: Optional[int] = None,
                 host_features: bool = False,
                 seed: int = 123456,
                 num_workers: Optional[int] = None,
                 process_index: int = 0,
                 process_count: int = 1):
        self.dataset = dataset
        self.cfg = cfg
        self._batch_size = batch_size or cfg.batch_size
        self.sampler = sampler or BucketingSampler(
            len(dataset), self._batch_size, seed=seed)
        self.host_features = host_features
        self.epoch = 0
        self._seed = seed
        # --num-workers: threads decoding utterances of a batch in
        # parallel (the reference forks DataLoader worker processes;
        # here WAV decode is native C++ that releases the GIL)
        self.num_workers = (cfg.num_workers if num_workers is None
                            else num_workers)
        self._pool = None
        # Under a device mesh, a ragged final bin (len(dataset) %
        # batch_size) cannot shard on the 'data' axis unless the
        # remainder happens to divide it — device_put rejects the batch.
        # pad_to_full=True cycles the bin's rows up to the full batch
        # size (the same convention as the multi-host slice padding
        # below); Batch.real_rows marks the real prefix so CER/WER
        # accumulation skips the duplicates. Loss/grads for that one
        # batch per epoch include the duplicated rows (documented
        # deviation — the reference's DataParallel scatters the ragged
        # batch instead). Bonus: batch shapes stay static, so the
        # ragged shape never compiles a second XLA program.
        self.pad_to_full = False
        # multi-host SPMD: every process runs the SAME sampler (same seed)
        # but decodes only its 1/process_count slice of each bin; bucket
        # shapes are derived from WAV headers + transcripts of the FULL
        # bin so all processes build identically-shaped local shards
        # (assembled by parallel.mesh.put_sharded)
        self.process_index = process_index
        self.process_count = max(1, process_count)
        # per-index (frame_bound, u_len) memo for _global_buckets:
        # manifests are immutable, so the header/transcript reads happen
        # once per index instead of once per batch per epoch
        self._bounds_cache: dict = {}

    def __len__(self) -> int:
        return len(self.sampler)

    def shuffle(self, epoch: int) -> None:
        self.sampler.shuffle(epoch)

    def __iter__(self) -> Iterator[Batch]:
        cfg = self.cfg
        rng = np.random.RandomState(self._seed + self.epoch)
        self.epoch += 1
        for bin_ids in self.sampler:
            yield self._build_batch(bin_ids, rng)

    def _get_items(self, bin_ids: List[int], rng: np.random.RandomState):
        if self.num_workers and self.num_workers > 1 and len(bin_ids) > 1:
            from concurrent.futures import ThreadPoolExecutor
            if self._pool is None:
                self._pool = ThreadPoolExecutor(self.num_workers)
            # derive one deterministic sub-seed per utterance up front,
            # then decode in parallel (unlike the reference's unseeded
            # forked workers, results are reproducible for a given seed)
            seeds = [rng.randint(0, 2 ** 31 - 1) for _ in bin_ids]
            return list(self._pool.map(
                lambda iv: self.dataset.get_item(
                    iv[0], np.random.RandomState(iv[1])),
                zip(bin_ids, seeds)))
        return [self.dataset.get_item(i, rng) for i in bin_ids]

    def _global_buckets(self, bin_ids: List[int]) -> tuple:
        """(T_b, U_b) for a bin, from WAV headers + transcript files only
        (no audio decode) — deterministic across hosts. Tempo augmentation
        can stretch audio by up to 1/0.85 (audio.py), so the frame bound
        is scaled; joint training picks a random manifest per row, so the
        bound covers every manifest's candidate at each index."""
        cfg = self.cfg
        from end2end_asr_tpu.data.audio import get_num_samples
        max_frames, max_u = 1, 1
        for i in bin_ids:
            bounds = self._bounds_cache.get(i)
            if bounds is None:
                f_i, u_i = 1, 1
                for entries in self.dataset.ids_list:
                    wav, txt = entries[i % len(entries)]
                    n = get_num_samples(wav)
                    if self.dataset.augment:
                        n = int(n / 0.85) + 1
                    f_i = max(f_i, num_frames(n, cfg.n_fft,
                                              cfg.hop_length))
                    u_i = max(u_i,
                              len(self.dataset.parse_transcript(txt)))
                bounds = self._bounds_cache[i] = (f_i, u_i)
            max_frames = max(max_frames, bounds[0])
            max_u = max(max_u, bounds[1])
        T_b = min(pick_bucket(min(max_frames, cfg.src_max_len),
                              cfg.src_buckets), cfg.src_max_len)
        U_b = min(pick_bucket(max_u, cfg.tgt_buckets), cfg.tgt_max_len)
        return T_b, U_b

    def _build_batch(self, bin_ids: List[int],
                     rng: np.random.RandomState) -> Batch:
        cfg = self.cfg
        n_fft, hop = cfg.n_fft, cfg.hop_length

        real_rows = len(bin_ids)
        full = self._batch_size
        if (self.pad_to_full and self.process_count == 1
                and 0 < real_rows < full):
            bin_ids = [bin_ids[k % real_rows] for k in range(full)]

        forced_buckets = None
        if self.process_count > 1:
            forced_buckets = self._global_buckets(bin_ids)
            # pad_to_full under multi-host: cycle the ragged bin up to
            # the FULL global batch before slicing, so every process
            # holds batch_size/process_count rows and the 'data'-axis
            # device_put never sees a ragged shard (ADVICE r4 — the flag
            # was silently process-count-divisibility-only here)
            if (self.pad_to_full and 0 < len(bin_ids) < full):
                bin_ids = [bin_ids[k % len(bin_ids)] for k in range(full)]
            per = (len(bin_ids) + self.process_count - 1) \
                // self.process_count
            # pad ragged tails by cycling so every process holds `per`
            # rows (make_array_from_process_local_data needs equal shards)
            padded = [bin_ids[k % len(bin_ids)]
                      for k in range(per * self.process_count)]
            lo = self.process_index * per
            bin_ids = padded[lo:lo + per]
            # the real/cycled distinction is global here (duplicates land
            # on arbitrary processes) — local trimming can't apply
            real_rows = -1

        items = self._get_items(bin_ids, rng)
        pcms = [it[0] for it in items]
        transcripts = [it[1] for it in items]

        frames = np.array([min(num_frames(len(y), n_fft, hop),
                               cfg.src_max_len) for y in pcms])
        if forced_buckets is None:
            T_b = pick_bucket(int(frames.max()), cfg.src_buckets)
            T_b = min(T_b, cfg.src_max_len)
            U_max = max(len(t) for t in transcripts)
            U_b = pick_bucket(U_max, cfg.tgt_buckets)
            U_b = min(U_b, cfg.tgt_max_len)
        else:
            T_b, U_b = forced_buckets
        frames = np.minimum(frames, T_b)

        B = len(items)
        targets = np.full((B, U_b), PAD_TOKEN, np.int32)
        tgt_lengths = np.zeros(B, np.int32)
        for i, t in enumerate(transcripts):
            t = t[:U_b]
            targets[i, :len(t)] = t
            tgt_lengths[i] = len(t)

        # throughput accounting counts REAL audio only: with pad_to_full
        # the cycled duplicate rows (indices >= real_rows) do consume
        # compute, but the meter divides by real utterances, so summing
        # the padded bin's seconds would skew utt/s and RTF low for that
        # one batch per epoch (ADVICE r4). real_rows == -1 means all real.
        n_real = real_rows if 0 < real_rows else len(pcms)
        utt_seconds = sum(len(y) for y in pcms[:n_real]) / cfg.sample_rate

        if self.host_features:
            F = cfg.n_freq
            spect = np.zeros((B, F, T_b), np.float32)
            for i, y in enumerate(pcms):
                s = parse_audio_features(
                    y, cfg.sample_rate, cfg.window_size, cfg.window_stride,
                    cfg.window, normalize=True, src_max_len=cfg.src_max_len)
                s = s[:, :T_b]
                spect[i, :, :s.shape[1]] = s
            return Batch(pcm=None, spect=spect, n_frames=frames,
                         src_bucket=T_b, targets=targets,
                         tgt_lengths=tgt_lengths,
                         src_percentages=frames / float(T_b),
                         utt_seconds=utt_seconds, real_rows=real_rows)

        # device-feature path: reflect-pad PCM rows on host, heavy math on TPU
        n_pcm = (T_b - 1) * hop  # samples that yield exactly T_b frames
        pad = n_fft // 2
        pcm = np.zeros((B, n_pcm + 2 * pad), np.float32)
        for i, y in enumerate(pcms):
            y = y[:n_pcm]
            pcm[i] = reflect_pad_pcm(y, n_fft, n_pcm)
        if cfg.pcm_wire_dtype == "int16":
            # halve the host→device copy; exact for WAV-sourced audio
            # (the decode is int16/32768, so ×32768 returns the original
            # samples; augmented audio rounds like the reference's sox
            # WAV-tempfile round trip). De-scaled on device in
            # ops.features.pcm_to_f32.
            pcm = np.clip(np.rint(pcm * 32768.0), -32768,
                          32767).astype(np.int16)
        return Batch(pcm=pcm, spect=None, n_frames=frames, src_bucket=T_b,
                     targets=targets, tgt_lengths=tgt_lengths,
                     src_percentages=frames / float(T_b),
                     utt_seconds=utt_seconds, real_rows=real_rows)


class Prefetcher:
    """Threaded batch prefetcher: builds up to `depth` batches ahead and
    (optionally) device_puts them in the producer thread so the
    host→device copy overlaps the previous step's compute."""

    def __init__(self, loader: AudioBatchLoader, depth: int = 2,
                 to_device: bool = True, shardings=None):
        # NOTE: per-utterance decode parallelism lives in
        # AudioBatchLoader._get_items (--num-workers); the producer here
        # is deliberately a single thread feeding a bounded queue.
        self.loader = loader
        self.depth = max(1, depth)
        self.to_device = to_device
        self.shardings = shardings  # optional dict field->sharding

    def __len__(self):
        return len(self.loader)

    def _device_put(self, batch: Batch) -> Batch:
        import dataclasses

        import jax

        fields = ("pcm", "spect", "n_frames", "targets", "tgt_lengths")
        if self.shardings is None:
            # ONE device_put over the whole batch pytree: per-field puts
            # each pay a fixed dispatch cost (~30 ms on the remote-TPU
            # tunnel — tools/probe_tunnel.py stage 4 vs 6), so batching
            # them halves the transfer-bound step floor.
            present = {f: getattr(batch, f) for f in fields
                       if getattr(batch, f) is not None}
            return dataclasses.replace(batch, **jax.device_put(present))

        def put(name, arr):
            if arr is None:
                return None
            sh = self.shardings.get(name)
            if sh is not None:
                from end2end_asr_tpu.parallel.mesh import put_sharded
                return put_sharded(arr, sh)
            return jax.device_put(arr)

        return dataclasses.replace(
            batch, **{f: put(f, getattr(batch, f)) for f in fields})

    def __iter__(self) -> Iterator[Batch]:
        q: "queue.Queue" = queue.Queue(maxsize=self.depth)
        SENTINEL = object()

        def producer():
            try:
                for batch in self.loader:
                    if self.to_device:
                        batch = self._device_put(batch)
                    q.put(batch)
                q.put(SENTINEL)
            except BaseException as e:  # surface in the consumer, don't
                q.put(e)                # silently end the epoch early

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is SENTINEL:
                break
            if isinstance(item, BaseException):
                raise item
            yield item
