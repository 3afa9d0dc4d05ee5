"""Fused train-time attention kernel (scores -> mask bias -> softmax ->
dropout -> probs @ V) with a recomputing backward.

Mirrors the reference's ScaledDotProductAttention + attn Dropout
(models/common_layers.py:202-225) for the TRAINING path only: the eval /
decode paths keep the XLA formulation in models/layers.py (dropout off at
eval makes the two identical there).

Why a kernel: with dropout on, the XLA graph materializes per layer the
f32 softmax probs, the dropped bf16 probs and the dropout bits as
backward residuals — measured 0.88 ms/step of direct cost plus ~1.2 ms
of alternate-memory pressure on the flagship step (BENCH_NOTES round 3).
This kernel's only residuals are q/k/v/bias/seed: the backward re-runs
the forward recurrence and regenerates the identical dropout mask from
the same per-(batch, head) `prng_seed`, so nothing (B, H, Tq, Tk)-sized
ever touches HBM.

Dropout semantics match models/layers.py `dropout`: keep probability is
round((1 - rate) * 2^16) / 2^16 — the kernel draws uint32 bits and
compares against thresh16 * 2^16, which is exactly the same keep
fraction — and the inverse scale uses that same quantized value, so the
estimator is unbiased. The RNG stream differs from the XLA path (Mosaic
per-core PRNG vs jax.random.bits); dropout only needs distributional
correctness, not bit parity.

Mask bias uses -1e9 instead of the XLA path's -inf: identical wherever
at least one key survives (exp(-1e9 - m) flushes to exactly 0), and
finite (uniform) instead of NaN on fully-masked rows — which only occur
for pad queries whose outputs are dead.

Under a sharded jit the kernel partitions on the batch dim
(ops/partition.py). Shards re-seed with their local program ids, so two
shards draw the same mask for the same local batch index — the same
replica-correlated dropout nn.DataParallel produces when it replicates
the RNG state per GPU (reference train.py:98-99).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from end2end_asr_tpu.ops.partition import batch_partitioned

__all__ = ["flash_mha_train", "dropout_thresh16"]


# single source of truth for the keep threshold — the XLA-path dropout
# (models/layers.py) and this kernel must keep bit-identical fractions
from end2end_asr_tpu.models.layers import dropout_thresh16  # noqa: F401


def _kernels(H, Tq, Tk, Dk, Dv, thresh16, cdt):
    """Build (fwd, bwd) kernel bodies for static shapes/rate."""
    inv_sqrt_d = np.float32(1.0 / math.sqrt(Dk))
    drop = thresh16 < 65536  # thresh16 == 65536 <=> rate 0: no dropout
    scale = np.float32(65536.0 / thresh16)
    thresh32 = np.uint32(thresh16 * 65536) if drop else None
    f32 = jnp.float32

    def softmax_rows(s_all):
        m = jnp.max(s_all, axis=-1, keepdims=True)
        p = jnp.exp(s_all - m)
        return p / jnp.sum(p, axis=-1, keepdims=True)

    def keep_mask(seed_ref, cell):
        pltpu.prng_seed(seed_ref[0], cell)
        bits = pltpu.bitcast(pltpu.prng_random_bits((H * Tq, Tk)),
                             jnp.uint32)
        return bits < thresh32

    def fwd(seed_ref, q_ref, k_ref, v_ref, bias_ref, o_ref, s_all, p_all):
        b = pl.program_id(0)
        for h in range(H):
            s = jax.lax.dot_general(q_ref[0, h], k_ref[0, h],
                                    (((1,), (1,)), ((), ())),
                                    preferred_element_type=f32)
            s_all[h * Tq:(h + 1) * Tq] = s * inv_sqrt_d + bias_ref[0]
        probs = softmax_rows(s_all[:])
        if drop:
            keep = keep_mask(seed_ref, b)
            probs = jnp.where(keep, probs * scale, jnp.zeros_like(probs))
        p_all[:] = probs.astype(cdt)
        for h in range(H):
            o = jax.lax.dot_general(p_all[h * Tq:(h + 1) * Tq], v_ref[0, h],
                                    (((1,), (0,)), ((), ())),
                                    preferred_element_type=f32)
            o_ref[0, h] = o.astype(cdt)

    def bwd(seed_ref, q_ref, k_ref, v_ref, bias_ref, g_ref,
            dq_ref, dk_ref, dv_ref, s_all, dp_all, ds_all):
        b = pl.program_id(0)
        for h in range(H):
            s = jax.lax.dot_general(q_ref[0, h], k_ref[0, h],
                                    (((1,), (1,)), ((), ())),
                                    preferred_element_type=f32)
            s_all[h * Tq:(h + 1) * Tq] = s * inv_sqrt_d + bias_ref[0]
            dp = jax.lax.dot_general(g_ref[0, h], v_ref[0, h],
                                     (((1,), (1,)), ((), ())),
                                     preferred_element_type=f32)
            dp_all[h * Tq:(h + 1) * Tq] = dp
        probs = softmax_rows(s_all[:])
        if drop:
            keep = keep_mask(seed_ref, b)
            dropped = jnp.where(keep, probs * scale, jnp.zeros_like(probs))
            dprobs = jnp.where(keep, dp_all[:] * scale,
                               jnp.zeros_like(probs))
        else:
            dropped = probs
            dprobs = dp_all[:]
        ds = probs * (dprobs - jnp.sum(dprobs * probs, axis=-1,
                                       keepdims=True))
        ds_all[:] = (ds * inv_sqrt_d).astype(cdt)
        dp_all[:] = dropped
        for h in range(H):
            sl = slice(h * Tq, (h + 1) * Tq)
            dv = jax.lax.dot_general(dp_all[sl].astype(cdt), g_ref[0, h],
                                     (((0,), (0,)), ((), ())),
                                     preferred_element_type=f32)
            dq = jax.lax.dot_general(ds_all[sl], k_ref[0, h],
                                     (((1,), (0,)), ((), ())),
                                     preferred_element_type=f32)
            dk = jax.lax.dot_general(ds_all[sl], q_ref[0, h],
                                     (((0,), (0,)), ((), ())),
                                     preferred_element_type=f32)
            dq_ref[0, h] = dq.astype(cdt)
            dk_ref[0, h] = dk.astype(cdt)
            dv_ref[0, h] = dv.astype(cdt)

    return fwd, bwd


@functools.lru_cache(maxsize=None)
def _calls(B, H, Tq, Tk, Dk, Dv, thresh16, cdt_name, interpret):
    cdt = jnp.dtype(cdt_name)
    fwd_k, bwd_k = _kernels(H, Tq, Tk, Dk, Dv, thresh16, cdt)
    qspec = pl.BlockSpec((1, H, Tq, Dk), lambda b: (b, 0, 0, 0))
    kspec = pl.BlockSpec((1, H, Tk, Dk), lambda b: (b, 0, 0, 0))
    vspec = pl.BlockSpec((1, H, Tk, Dv), lambda b: (b, 0, 0, 0))
    ospec = pl.BlockSpec((1, H, Tq, Dv), lambda b: (b, 0, 0, 0))
    bspec = pl.BlockSpec((1, Tq, Tk), lambda b: (b, 0, 0))
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    # On CPU, kernels with prng ops need Mosaic interpret mode (the HLO
    # interpreter cannot lower prng_seed); prng-free kernels use the HLO
    # interpreter, whose lowering stays compatible with
    # custom_partitioning (Mosaic interpret's io_callback effect is not).
    if not interpret:
        mode = False
    elif thresh16 < 65536:
        mode = pltpu.InterpretParams()
    else:
        mode = True
    fwd = pl.pallas_call(
        fwd_k, grid=(B,),
        in_specs=[smem, qspec, kspec, vspec, bspec],
        out_specs=ospec,
        out_shape=jax.ShapeDtypeStruct((B, H, Tq, Dv), cdt),
        scratch_shapes=[pltpu.VMEM((H * Tq, Tk), jnp.float32),
                        pltpu.VMEM((H * Tq, Tk), cdt)],
        interpret=mode)
    bwd = pl.pallas_call(
        bwd_k, grid=(B,),
        in_specs=[smem, qspec, kspec, vspec, bspec, ospec],
        out_specs=(qspec, kspec, vspec),
        out_shape=(jax.ShapeDtypeStruct((B, H, Tq, Dk), cdt),
                   jax.ShapeDtypeStruct((B, H, Tk, Dk), cdt),
                   jax.ShapeDtypeStruct((B, H, Tk, Dv), cdt)),
        scratch_shapes=[pltpu.VMEM((H * Tq, Tk), jnp.float32),
                        pltpu.VMEM((H * Tq, Tk), jnp.float32),
                        pltpu.VMEM((H * Tq, Tk), cdt)],
        interpret=mode)
    return fwd, bwd


# ---------------------------------------------------------------------------
# SPMD batch partitioning (statics TRAILING, per ops/partition.py contract)
# ---------------------------------------------------------------------------

def _fwd_impl(seed, q, k, v, bias, thresh16, interpret):
    B, H, Tq, Dk = q.shape
    Tk = k.shape[2]
    Dv = v.shape[3]
    fwd, _ = _calls(B, H, Tq, Tk, Dk, Dv, thresh16, q.dtype.name, interpret)
    return fwd(seed, q, k, v, bias)


def _bwd_impl(seed, q, k, v, bias, g, thresh16, interpret):
    B, H, Tq, Dk = q.shape
    Tk = k.shape[2]
    Dv = v.shape[3]
    _, bwd = _calls(B, H, Tq, Tk, Dk, Dv, thresh16, q.dtype.name, interpret)
    return bwd(seed, q, k, v, bias, g)


_fwd_partitioned = batch_partitioned(
    _fwd_impl, batch_args=(1, 2, 3, 4), n_out=1,
    static_argnums=(5, 6),
    sharding_rule="x, b h t d, b h s d, b h s e, b t s -> b h t e")

_bwd_partitioned = batch_partitioned(
    _bwd_impl, batch_args=(1, 2, 3, 4, 5), n_out=3,
    static_argnums=(6, 7),
    sharding_rule="x, b h t d, b h s d, b h s e, b t s, b h t e -> "
                  "b h t d, b h s d, b h s e")


# ---------------------------------------------------------------------------
# Public entry: custom VJP
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def flash_mha_train(q, k, v, bias, seed, rate):
    """Fused softmax(q k^T / sqrt(Dk) + bias) -> dropout(rate) -> @ v.

    q, k: (B, H, Tq|Tk, Dk); v: (B, H, Tk, Dv) — all in the compute
    dtype (bf16 on TPU). bias: (B, Tq, Tk) float32 additive mask
    (0 or -1e9). seed: (1,) int32. rate: static dropout rate in [0, 1).
    Returns (B, H, Tq, Dv) in q's dtype. bias and seed get zero/no
    cotangents: bias comes from pad/causal masks (never trained) and the
    call site in models/layers.py stop_gradients it so the contract is
    visible there.
    """
    out, _ = _flash_fwd(q, k, v, bias, seed, rate)
    return out


def _flash_fwd(q, k, v, bias, seed, rate):
    thresh16 = dropout_thresh16(rate)
    interpret = jax.default_backend() == "cpu"
    if interpret and thresh16 < 65536:
        # Mosaic interpret mode's callback effect cannot lower under
        # custom_partitioning — CPU dropout runs unpartitioned.
        out = _fwd_impl(seed, q, k, v, bias, thresh16, interpret)
    else:
        out = _fwd_partitioned(seed, q, k, v, bias, thresh16, interpret)
    return out, (q, k, v, bias, seed)


def _flash_bwd(rate, res, g):
    q, k, v, bias, seed = res
    thresh16 = dropout_thresh16(rate)
    interpret = jax.default_backend() == "cpu"
    if interpret and thresh16 < 65536:
        dq, dk, dv = _bwd_impl(seed, q, k, v, bias, g.astype(q.dtype),
                               thresh16, interpret)
    else:
        dq, dk, dv = _bwd_partitioned(seed, q, k, v, bias,
                                      g.astype(q.dtype), thresh16,
                                      interpret)
    return dq, dk, dv, jnp.zeros_like(bias), jnp.zeros_like(seed)


flash_mha_train.defvjp(_flash_fwd, _flash_bwd)


def seed_from_key(key) -> jnp.ndarray:
    """(1,) int32 kernel seed drawn from a JAX PRNG key."""
    return jax.lax.bitcast_convert_type(
        jax.random.bits(key, (1,), jnp.uint32), jnp.int32)


def dropout_bits(seed, B, H, Tq, Tk):
    """(B, H*Tq, Tk) uint32 — exactly the RNG stream the fwd AND bwd
    kernels draw for these shapes (same prng_seed sequence). Test-only:
    lets a pure-JAX reference reproduce the kernel's dropout mask
    (keep = bits < thresh16 * 2^16) within one execution mode."""
    def body(seed_ref, o_ref):
        pltpu.prng_seed(seed_ref[0], pl.program_id(0))
        o_ref[0] = pltpu.bitcast(pltpu.prng_random_bits((H * Tq, Tk)),
                                 jnp.uint32)
    interpret = jax.default_backend() == "cpu"
    return pl.pallas_call(
        body, grid=(B,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec((1, H * Tq, Tk), lambda b: (b, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, H * Tq, Tk), jnp.uint32),
        interpret=pltpu.InterpretParams() if interpret else False)(seed)
