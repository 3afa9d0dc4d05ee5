"""CTC loss in pure JAX (lax.scan alpha recursion), compatible with
torch.nn.functional.ctc_loss semantics used by the reference
(utils/metrics.py:133-154): blank id 0, 'mean' reduction = per-sample loss
divided by target_length, then averaged over the batch.

Static shapes throughout: the extended label sequence (blank-interleaved)
has width 2*U+1 for a (B, U) target batch; per-sample input/target lengths
select the proper final alphas with gathers, so one compiled program serves
every bucket.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

NEG_INF = -1e30


def _interleave_blanks(targets: jnp.ndarray, blank: int) -> jnp.ndarray:
    """(B, U) -> (B, 2U+1): [blank, t0, blank, t1, …, blank]."""
    B, U = targets.shape
    z = jnp.full((B, 2 * U + 1), blank, dtype=targets.dtype)
    return z.at[:, 1::2].set(targets)


@functools.partial(jax.jit, static_argnames=("blank", "reduction"))
def ctc_loss(log_probs: jnp.ndarray, targets: jnp.ndarray,
             input_lengths: jnp.ndarray, target_lengths: jnp.ndarray,
             blank: int = 0, reduction: str = "mean") -> jnp.ndarray:
    """log_probs: (B, T, C) log-softmax outputs; targets: (B, U) label ids
    (PAD content beyond target_lengths is ignored); lengths: (B,).
    """
    B, T, C = log_probs.shape
    U = targets.shape[1]
    S = 2 * U + 1

    z = _interleave_blanks(targets, blank)  # (B, S)
    s_idx = jnp.arange(S)[None, :]

    # allow a diagonal skip s-2 -> s when z_s is a label and differs from z_{s-2}
    z_prev2 = jnp.pad(z, ((0, 0), (2, 0)), constant_values=blank)[:, :S]
    can_skip = (z != blank) & (z != z_prev2)
    valid_s = s_idx < (2 * target_lengths[:, None] + 1)

    lp_z0 = jnp.take_along_axis(log_probs[:, 0], z, axis=1)  # (B, S)
    alpha0 = jnp.where(s_idx <= 1, lp_z0, NEG_INF)
    alpha0 = jnp.where(valid_s, alpha0, NEG_INF)

    def step(carry, t):
        alpha, final = carry
        a_shift1 = jnp.pad(alpha, ((0, 0), (1, 0)), constant_values=NEG_INF)[:, :S]
        a_shift2 = jnp.pad(alpha, ((0, 0), (2, 0)), constant_values=NEG_INF)[:, :S]
        a_skip = jnp.where(can_skip, a_shift2, NEG_INF)
        stacked = jnp.stack([alpha, a_shift1, a_skip], axis=0)
        m = jnp.max(stacked, axis=0)
        summed = m + jnp.log(jnp.sum(jnp.exp(stacked - m[None]), axis=0))
        summed = jnp.where(m <= NEG_INF / 2, NEG_INF, summed)
        lp_t = jnp.take_along_axis(log_probs[:, t], z, axis=1)
        new_alpha = jnp.where(valid_s, summed + lp_t, NEG_INF)
        new_alpha = jnp.where(t < input_lengths[:, None], new_alpha, alpha)

        # when t == input_length - 1, record the final log-likelihood
        end1 = 2 * target_lengths  # last blank
        end2 = jnp.maximum(2 * target_lengths - 1, 0)  # last label
        cur_alpha = new_alpha
        a_end1 = jnp.take_along_axis(cur_alpha, end1[:, None], axis=1)[:, 0]
        a_end2 = jnp.take_along_axis(cur_alpha, end2[:, None], axis=1)[:, 0]
        a_end2 = jnp.where(target_lengths > 0, a_end2, NEG_INF)
        mx = jnp.maximum(a_end1, a_end2)
        ll = mx + jnp.log(jnp.exp(a_end1 - mx) + jnp.exp(a_end2 - mx))
        ll = jnp.where(mx <= NEG_INF / 2, NEG_INF, ll)
        final = jnp.where(t == input_lengths - 1, ll, final)
        return (new_alpha, final), None

    # t = 0 case: input_length could be 1
    init_final = jnp.full((B,), NEG_INF)
    end1 = 2 * target_lengths
    end2 = jnp.maximum(2 * target_lengths - 1, 0)
    a_end1 = jnp.take_along_axis(alpha0, end1[:, None], axis=1)[:, 0]
    a_end2 = jnp.take_along_axis(alpha0, end2[:, None], axis=1)[:, 0]
    a_end2 = jnp.where(target_lengths > 0, a_end2, NEG_INF)
    mx = jnp.maximum(a_end1, a_end2)
    ll0 = mx + jnp.log(jnp.exp(a_end1 - mx) + jnp.exp(a_end2 - mx))
    ll0 = jnp.where(mx <= NEG_INF / 2, NEG_INF, ll0)
    init_final = jnp.where(input_lengths == 1, ll0, init_final)

    (alpha, final), _ = jax.lax.scan(
        step, (alpha0, init_final), jnp.arange(1, T))

    # Infeasible rows (input_length < CTC path length, or input_length
    # 0): the recursion bottoms out at the NEG_INF sentinel, i.e. nll
    # ~1e30 — large but FINITE, so the trainer's isfinite batch-skip
    # would NOT engage. torch F.ctc_loss (no zero_infinity) returns
    # literal +inf there and the reference skips the batch
    # (trainer/asr/trainer.py:87-90); promote the sentinel to a true
    # inf so the skip semantics match. The where() also zeroes these
    # rows' cotangent path (no sentinel-polluted gradients).
    nll = -final  # (B,)
    nll = jnp.where(final <= NEG_INF / 2, jnp.inf, nll)
    if reduction == "mean":
        # torch 'mean': divide each by target_length (clamped to 1), average
        return jnp.mean(nll / jnp.maximum(target_lengths, 1))
    if reduction == "sum":
        return jnp.sum(nll)
    return nll
