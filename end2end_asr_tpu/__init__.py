"""end2end_asr_tpu — a TPU-native (JAX/XLA/Pallas/pjit) end-to-end speech
recognition framework with the capabilities of gentaiscool/end2end-asr-pytorch.

Re-designed TPU-first, not a port:
  * pure-functional models (param pytrees + init/apply) compiled to single
    XLA programs,
  * static bucketed shapes instead of dynamic per-batch padding,
  * on-device fused Pallas feature extraction (STFT + log1p + normalize),
  * KV-cached `lax.scan` greedy/beam decoding,
  * SPMD data parallelism via `jax.sharding.Mesh` + `shard_map`/`pjit`
    (replaces the reference's single-process nn.DataParallel),
  * native C++ runtime helpers (WAV decode, resample/tempo/gain,
    Levenshtein) loaded through ctypes.

Reference behavior map: see SURVEY.md at the repo root; individual modules
cite the corresponding reference files (path:line under /root/reference).
"""

__version__ = "0.1.0"

from end2end_asr_tpu.config import (  # noqa: F401
    Config,
    PAD_TOKEN,
    SOS_TOKEN,
    EOS_TOKEN,
    PAD_CHAR,
    SOS_CHAR,
    EOS_CHAR,
)
