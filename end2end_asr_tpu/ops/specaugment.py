"""SpecAugment (Park et al., 2019): frequency and time masking applied
on-device to the batched spectrogram inside the train step.

Beyond the reference's capability set (its only augmentations are
tempo/gain/noise on raw audio) — standard for modern ASR training;
enabled with --spec-augment. Pure function of an explicit PRNG key, so
the augmented train step stays a single compiled program.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("n_freq_masks", "freq_width",
                                             "n_time_masks", "time_width"))
def apply_spec_augment(rng, spect: jnp.ndarray, n_frames: jnp.ndarray,
                       n_freq_masks: int = 2, freq_width: int = 27,
                       n_time_masks: int = 2, time_width: int = 100
                       ) -> jnp.ndarray:
    """spect: (B, F, T) normalized log-spectrogram (masked regions are set
    to 0 = the per-utterance mean). n_frames: (B,) valid frame counts —
    time masks are confined to the valid region."""
    B, F, T = spect.shape
    f_idx = jnp.arange(F)[None, :]
    t_idx = jnp.arange(T)[None, :]

    keys = jax.random.split(rng, 2 * (n_freq_masks + n_time_masks))
    ki = 0

    mask = jnp.ones((B, F, T), bool)
    for _ in range(n_freq_masks):
        width = jax.random.randint(keys[ki], (B, 1), 0, freq_width + 1)
        start = jax.random.randint(keys[ki + 1], (B, 1), 0,
                                   jnp.maximum(F - freq_width, 1))
        ki += 2
        band = (f_idx >= start) & (f_idx < start + width)  # (B, F)
        mask = mask & ~band[:, :, None]

    for _ in range(n_time_masks):
        valid = jnp.maximum(n_frames[:, None], 1)
        width = jax.random.randint(keys[ki], (B, 1), 0, time_width + 1)
        width = jnp.minimum(width, valid)
        max_start = jnp.maximum(valid - width, 1)
        start = (jax.random.uniform(keys[ki + 1], (B, 1))
                 * max_start).astype(jnp.int32)
        ki += 2
        band = (t_idx >= start) & (t_idx < start + width)  # (B, T)
        mask = mask & ~band[:, None, :]

    return jnp.where(mask, spect, 0.0)
