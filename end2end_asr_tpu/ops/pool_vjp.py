"""2x2/2 max-pool with a Pallas scatter backward (select_and_scatter-free).

The reference's vgg frontend pools with torch MaxPool2d
(models/asr/transformer.py:36-44), whose backward routes each pooled
gradient to the first-argmax element of its window. XLA expresses that
backward as select-and-scatter, which ran at ~18% of HBM bandwidth on
v5e (2.55 ms of a 24 ms train step for the first vgg pool). This module
keeps the forward as reduce_window (already optimal, bit-identical) and
replaces only the backward with a Pallas kernel.

Layout trick: the (..., T, C) tail of the conv output reshapes for free
(row-major identical) to (..., T/2, 2C), putting the even/odd time
phases in lane halves of a fully-aligned 128-multiple tile. The window
argmax and gradient scatter then become full-width vector selects plus
one half-width lane rotate — no strided access, no sublane interleave.
All in-kernel compute is f32 (Mosaic only rotates 32-bit data).

Tie-breaking matches select_and_scatter / torch exactly: first window
element in (row, column) order wins.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pool_fwd(y: jnp.ndarray) -> jnp.ndarray:
    return jax.lax.reduce_window(
        y, -jnp.inf, jax.lax.max,
        window_dimensions=(1, 2, 2, 1), window_strides=(1, 2, 2, 1),
        padding="VALID")


def _bwd_kernel(y_ref, g_ref, dy_ref, *, C: int, last_odd: bool):
    """Grid (B, ceil(F/2)). Blocks: y (1,2,Tp,2C), g (1,1,Tp,C),
    dy (1,2,Tp,2C). Lanes [0:C] = even-t phase, [C:2C] = odd-t."""
    ya = y_ref[0, 0].astype(jnp.float32)
    yb = y_ref[0, 1].astype(jnp.float32)
    ya_sw = pltpu.roll(ya, C, axis=1)   # partner phase, halves swapped
    yb_sw = pltpu.roll(yb, C, axis=1)
    lo = jax.lax.broadcasted_iota(jnp.int32, ya.shape, 1) < C
    # first-wins in window order (a-even, a-odd, b-even, b-odd):
    # within a row the even lane (lo half) wins ties; row a beats row b.
    # (Boolean selects are avoided — Mosaic has no 1-bit select_n — so
    # the phase-dependent >=/> splits into pure logical ops.)
    first_a = (ya > ya_sw) | (lo & (ya == ya_sw))
    first_b = (yb > yb_sw) | (lo & (yb == yb_sw))
    win_a = first_a & (ya >= jnp.maximum(yb, yb_sw))
    win_b = first_b & (yb > jnp.maximum(ya, ya_sw))
    g2 = pltpu.repeat(g_ref[0, 0].astype(jnp.float32), 2, axis=1)  # [g|g]
    zero = jnp.float32(0)
    dy_a = jnp.where(win_a, g2, zero).astype(dy_ref.dtype)
    dy_b = jnp.where(win_b, g2, zero).astype(dy_ref.dtype)
    if last_odd:
        # odd F: the final block's first row (F-1) is outside every pool
        # window; its second row is padding. Zero both.
        is_last = pl.program_id(1) == pl.num_programs(1) - 1

        @pl.when(is_last)
        def _():
            dy_ref[0, 0] = jnp.zeros_like(dy_a)
            dy_ref[0, 1] = jnp.zeros_like(dy_b)

        @pl.when(jnp.logical_not(is_last))
        def _():
            dy_ref[0, 0] = dy_a
            dy_ref[0, 1] = dy_b
    else:
        dy_ref[0, 0] = dy_a
        dy_ref[0, 1] = dy_b


def _pool_bwd_impl(y2: jnp.ndarray, g: jnp.ndarray) -> jnp.ndarray:
    """y2: (B, F, Tp, 2C) phase-paired view. Returns dy in the same view."""
    B, F, Tp, C2 = y2.shape
    C = C2 // 2
    Fp = g.shape[1]
    nf = (F + 1) // 2
    return pl.pallas_call(
        functools.partial(_bwd_kernel, C=C, last_odd=(F % 2 == 1)),
        grid=(B, nf),
        in_specs=[
            pl.BlockSpec((1, 2, Tp, 2 * C), lambda b, f: (b, f, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, Tp, C),
                         lambda b, f: (b, jnp.minimum(f, Fp - 1), 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 2, Tp, 2 * C), lambda b, f: (b, f, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, F, Tp, 2 * C), y2.dtype),
        interpret=jax.default_backend() == "cpu",
    )(y2, g)


# batch-dim SPMD partitioning (ops/partition.py): without it the custom
# call is replicated under a sharded jit
from end2end_asr_tpu.ops.partition import batch_partitioned  # noqa: E402

_pool_bwd_partitioned = batch_partitioned(
    _pool_bwd_impl, batch_args=(0, 1), n_out=1,
    sharding_rule="b f t c, b g t h -> b f t c")


def _pool_bwd_pallas(y: jnp.ndarray, g: jnp.ndarray) -> jnp.ndarray:
    B, F, T, C = y.shape
    y2 = y.reshape(B, F, T // 2, 2 * C)    # free: row-major identical
    dy2 = _pool_bwd_partitioned(y2, g)
    return dy2.reshape(B, F, T, C)


@jax.custom_vjp
def max_pool2_vjp(y: jnp.ndarray) -> jnp.ndarray:
    """maxpool2x2 stride 2 (VALID) over (B, F, T, C); Pallas backward."""
    return _pool_fwd(y)


def _fwd_rule(y):
    return _pool_fwd(y), y


def _bwd_rule(y, g):
    return (_pool_bwd_pallas(y, g),)


max_pool2_vjp.defvjp(_fwd_rule, _bwd_rule)


def max_pool2(y: jnp.ndarray) -> jnp.ndarray:
    """Pool entry point: Pallas backward when the tail is lane-friendly
    (even T, 64-multiple C), plain reduce_window otherwise."""
    _, _, T, C = y.shape
    if T % 2 == 0 and C % 64 == 0:
        return max_pool2_vjp(y)
    return _pool_fwd(y)
