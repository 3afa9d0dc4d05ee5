"""Losses and token-level accuracy, matching utils/metrics.py:78-168.

`cross_entropy_loss` reproduces the reference's manual label-smoothing:
one_hot*(1-eps) + (1-one_hot)*eps/C (note: the at-target mass is exactly
1-eps, NOT 1-eps+eps/C), summed against log-softmax, masked-mean over
non-PAD positions (metrics.py:115-132). With smoothing=0 it is standard CE
with ignore_index=PAD and mean reduction.

CTC lives in ops/ctc.py; `calculate_loss` dispatches like
metrics.py:102-168.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from end2end_asr_tpu.config import PAD_TOKEN
from end2end_asr_tpu.ops.ctc import ctc_loss


@functools.partial(jax.jit, static_argnames=("smoothing",))
def cross_entropy_loss(pred: jnp.ndarray, gold: jnp.ndarray,
                       smoothing: float = 0.0) -> jnp.ndarray:
    """pred: (B, U, C) f32 logits; gold: (B, U) int ids. Scalar loss."""
    B, U, C = pred.shape
    pred = pred.reshape(B * U, C).astype(jnp.float32)
    gold = gold.reshape(B * U)
    non_pad = gold != PAD_TOKEN
    num_word = jnp.maximum(jnp.sum(non_pad), 1)
    log_prob = jax.nn.log_softmax(pred, axis=-1)

    if smoothing > 0.0:
        eps = smoothing
        gold_for_scatter = jnp.where(non_pad, gold, 0)
        one_hot = jax.nn.one_hot(gold_for_scatter, C, dtype=jnp.float32)
        one_hot = one_hot * (1.0 - eps) + (1.0 - one_hot) * eps / C
        loss = -jnp.sum(one_hot * log_prob, axis=-1)
    else:
        loss = -jnp.take_along_axis(log_prob, gold[:, None], axis=-1)[:, 0]

    loss = jnp.where(non_pad, loss, 0.0)
    return jnp.sum(loss) / num_word


def token_accuracy(pred: jnp.ndarray, gold: jnp.ndarray) -> jnp.ndarray:
    """num_correct over non-PAD tokens (metrics.py:88-95)."""
    hyp = jnp.argmax(pred, axis=-1)
    non_pad = gold != PAD_TOKEN
    return jnp.sum((hyp == gold) & non_pad)


def calculate_loss(pred: jnp.ndarray, gold: jnp.ndarray,
                   input_lengths: Optional[jnp.ndarray] = None,
                   target_lengths: Optional[jnp.ndarray] = None,
                   smoothing: float = 0.0,
                   loss_type: str = "ce") -> jnp.ndarray:
    if loss_type == "ce":
        return cross_entropy_loss(pred, gold, smoothing)
    if loss_type == "ctc":
        log_probs = jax.nn.log_softmax(pred.astype(jnp.float32), axis=-1)
        return ctc_loss(log_probs, gold, input_lengths, target_lengths,
                        blank=0, reduction="mean")
    raise ValueError(f"loss is not defined: {loss_type}")


def calculate_metrics(pred: jnp.ndarray, gold: jnp.ndarray,
                      input_lengths: Optional[jnp.ndarray] = None,
                      target_lengths: Optional[jnp.ndarray] = None,
                      smoothing: float = 0.0, loss_type: str = "ce"
                      ) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
    loss = calculate_loss(pred, gold, input_lengths, target_lengths,
                          smoothing, loss_type)
    if loss_type == "ce":
        return loss, token_accuracy(pred, gold)
    return loss, None
