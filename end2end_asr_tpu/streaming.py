"""Chunked / streaming transcription API.

The reference has no streaming surface at all — transcription is a
whole-file batch affair (test.py + Decoder.greedy_search,
models/asr/transformer.py:316-394). This module adds an incremental API
on top of this framework's compiled paths: PCM arrives in arbitrary
chunks, and each `feed()` returns the current partial transcript.

Honest scoping: the encoder is a bidirectional transformer (every frame
attends to the whole utterance, transformer.py:70-101), so exact
streaming REQUIRES re-encoding the audio received so far — there is no
causal encoder cache to reuse. What makes this cheap on TPU is the
bucketing design: audio lengths snap to the static `src_buckets` ladder,
so every re-encode reuses an already-compiled program (first call per
bucket compiles, the rest are cache hits), and the KV-cached greedy
decoder re-decodes from scratch in one `lax.while_loop` with early exit.
At the flagship config a full encode+decode pass is ~10 ms of device
time — comfortably real-time for interactive use at any chunk cadence.

The partials are exactly what the batch pipeline would produce for the
same prefix of audio (same featurizer, same padding, same decode), so
`flush()` equals `transcribe.py` on the whole file.
"""

from __future__ import annotations

from typing import Dict, List

import numpy as np

from end2end_asr_tpu.config import Config
from end2end_asr_tpu.data.loader import pick_bucket
from end2end_asr_tpu.decoding.greedy import (greedy_decode_progressive,
                                             ids_to_strings)
from end2end_asr_tpu.models.transformer import dims_from_config
from end2end_asr_tpu.data.features import num_frames
from end2end_asr_tpu.ops.features import reflect_pad_pcm
from end2end_asr_tpu.training.steps import make_encode_fn


def strip_specials(s: str) -> str:
    from end2end_asr_tpu.config import EOS_CHAR, PAD_CHAR, SOS_CHAR
    return (s.replace(EOS_CHAR, "").replace(SOS_CHAR, "")
            .replace(PAD_CHAR, ""))


class StreamingTranscriber:
    """Incremental transcription over a growing PCM buffer.

    Usage:
        st = StreamingTranscriber(params, model_state, cfg, id2label)
        for chunk in microphone():          # float32 PCM at cfg.sample_rate
            partial = st.feed(chunk)        # current best transcript
        final = st.flush()

    `min_new_frames` throttles recomputation: feed() returns the cached
    partial until at least that many new spectrogram frames arrived
    (default 10 = 100 ms at the reference's 10 ms hop).
    """

    def __init__(self, params, model_state, cfg: Config,
                 id2label: Dict[int, str], beam=None,
                 min_new_frames: int = 10):
        self.params = params
        self.model_state = model_state
        self.cfg = cfg
        self.id2label = id2label
        self.dims = dims_from_config(cfg)
        self.beam = beam  # optional BeamDecoder for beam partials
        self.min_new_frames = min_new_frames
        self._encode_fn = make_encode_fn(cfg, self.dims, from_pcm=True)
        self._pcm: List[np.ndarray] = []
        self._n_samples = 0
        self._decoded_frames = 0
        self._partial = ""

    def _frames(self, n_samples: int) -> int:
        # Mirror transcribe.py exactly: librosa center=True frame count
        # (1 + n_samples//hop), so flush() == transcribe.py on the file.
        return max(num_frames(n_samples, self.cfg.n_fft,
                              self.cfg.hop_length), 1)

    def feed(self, pcm_chunk) -> str:
        """Append PCM (1-D float array) and return the current partial
        transcript (cached unless enough new audio arrived)."""
        pcm_chunk = np.asarray(pcm_chunk, np.float32).reshape(-1)
        if pcm_chunk.size:
            self._pcm.append(pcm_chunk)
            self._n_samples += pcm_chunk.size
        if self._n_samples == 0:
            return self._partial  # nothing buffered yet (empty chunks)
        frames = self._frames(self._n_samples)
        if frames - self._decoded_frames < self.min_new_frames:
            return self._partial
        return self._decode()

    def flush(self) -> str:
        """Final transcript over all audio received so far."""
        if self._n_samples == 0:
            return ""
        if self._frames(self._n_samples) == self._decoded_frames:
            # the last feed() already decoded every frame — the re-run
            # would recompute exactly the cached partial
            return self._partial
        return self._decode()

    def reset(self):
        self._pcm.clear()
        self._n_samples = 0
        self._decoded_frames = 0
        self._partial = ""

    def _decode(self) -> str:
        cfg = self.cfg
        hop, n_fft = cfg.hop_length, cfg.n_fft  # same derivation as the
        # batch loader — one owner for the frame geometry
        y = np.concatenate(self._pcm) if len(self._pcm) > 1 else self._pcm[0]
        self._pcm = [y]
        frames = self._frames(y.size)
        T_b = min(pick_bucket(min(frames, cfg.src_max_len),
                              cfg.src_buckets), cfg.src_max_len)
        n_pcm = (T_b - 1) * hop
        pcm = reflect_pad_pcm(y[:n_pcm], n_fft, n_pcm)[None, :]
        enc_out, _ = self._encode_fn(
            self.params, self.model_state, pcm,
            np.asarray([min(frames, T_b)], np.int32), spect_T=T_b)
        if self.beam is not None:
            text = self.beam.decode(self.params, enc_out)[0]
        else:
            max_len = min(cfg.decode_max_len, cfg.tgt_max_len)
            ids = greedy_decode_progressive(
                self.params, enc_out, self.dims, max_len=max_len,
                stage_len=cfg.decode_stage_len or max_len)
            text = ids_to_strings(ids, self.id2label)[0]
        self._decoded_frames = frames
        self._partial = strip_specials(text).strip()
        return self._partial
