"""Fused train-attention kernel (ops/attention_fused.py).

Semantics under test mirror the reference's ScaledDotProductAttention +
attn Dropout (models/common_layers.py:202-225): scaled scores, additive
mask, softmax, inverted dropout, probs @ V. The rate-0 path must match a
pure-JAX reference exactly (fwd and VJP); the dropout path must be
deterministic per seed, use the exact keep fraction round(keep*2^16)/2^16,
and — the load-bearing property — the backward must regenerate the SAME
mask the forward drew (verified via the kernel's own RNG stream exported
by dropout_bits)."""

import math

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from end2end_asr_tpu.models import layers as L
from end2end_asr_tpu.ops import attention_fused as AF

B, H, T, S, Dk, Dv = 2, 2, 16, 24, 8, 8


def _inputs(seed=0, masked=True):
    r = np.random.RandomState(seed)
    q = jnp.asarray(r.randn(B, H, T, Dk), jnp.float32)
    k = jnp.asarray(r.randn(B, H, S, Dk), jnp.float32)
    v = jnp.asarray(r.randn(B, H, S, Dv), jnp.float32)
    mask = jnp.asarray(r.rand(B, T, S) < (0.2 if masked else 0.0))
    bias = jnp.where(mask, jnp.float32(-1e9), jnp.float32(0.0))
    return q, k, v, bias


def _ref(q, k, v, bias, keep=None, scale=None):
    s = jnp.einsum("bhtd,bhsd->bhts", q, k) / math.sqrt(Dk) + bias[:, None]
    p = jax.nn.softmax(s, -1)
    if keep is not None:
        p = jnp.where(keep, p * scale, jnp.zeros_like(p))
    return jnp.einsum("bhts,bhsd->bhtd", p, v)


def test_rate0_matches_reference_fwd_and_vjp():
    q, k, v, bias = _inputs()
    seed = jnp.array([7], jnp.int32)
    out = jax.jit(lambda *a: AF.flash_mha_train(*a, 0.0))(q, k, v, bias,
                                                          seed)
    np.testing.assert_allclose(np.asarray(out),
                               np.asarray(_ref(q, k, v, bias)),
                               atol=1e-5)
    g = jax.jit(jax.grad(
        lambda q, k, v: jnp.sum(
            AF.flash_mha_train(q, k, v, bias, seed, 0.0) ** 2),
        argnums=(0, 1, 2)))(q, k, v)
    gr = jax.jit(jax.grad(
        lambda q, k, v: jnp.sum(_ref(q, k, v, bias) ** 2),
        argnums=(0, 1, 2)))(q, k, v)
    for a, b in zip(g, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)


# Mosaic interpret mode's PRNG is a zero stub (prng_random_bits returns
# all-zero bits on CPU), so statistics/seed-sensitivity are only testable
# on a real chip; the mask-consistency tests below stay valid on CPU
# because fwd, bwd and dropout_bits all draw the SAME (stubbed) stream.
_TPU_ONLY = pytest.mark.skipif(
    jax.default_backend() != "tpu",
    reason="Mosaic interpret PRNG returns zero bits on CPU")


@_TPU_ONLY
def test_dropout_deterministic_and_seed_sensitive():
    q, k, v, bias = _inputs()
    f = jax.jit(lambda s: AF.flash_mha_train(q, k, v, bias, s, 0.5))
    s1, s2 = jnp.array([7], jnp.int32), jnp.array([8], jnp.int32)
    assert bool(jnp.all(f(s1) == f(s1)))
    assert bool(jnp.any(f(s1) != f(s2)))


def test_dropout_mask_matches_extracted_bits_fwd_and_vjp():
    """The forward applies keep = bits < thresh, and the backward
    regenerates the identical mask: both must equal a pure-JAX reference
    driven by the kernel's own RNG stream."""
    rate = 0.37
    thresh16 = AF.dropout_thresh16(rate)
    scale = jnp.float32(65536.0 / thresh16)
    q, k, v, bias = _inputs()
    seed = jnp.array([123], jnp.int32)
    bits = AF.dropout_bits(seed, B, H, T, S)
    keep = (np.asarray(bits) < np.uint32(thresh16 * 65536)).reshape(
        B, H, T, S)
    keep = jnp.asarray(keep)

    out = jax.jit(lambda *a: AF.flash_mha_train(*a, rate))(q, k, v, bias,
                                                           seed)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(_ref(q, k, v, bias, keep, scale)),
        atol=1e-5)

    g = jax.jit(jax.grad(
        lambda q, k, v: jnp.sum(
            AF.flash_mha_train(q, k, v, bias, seed, rate) ** 2),
        argnums=(0, 1, 2)))(q, k, v)
    gr = jax.jit(jax.grad(
        lambda q, k, v: jnp.sum(_ref(q, k, v, bias, keep, scale) ** 2),
        argnums=(0, 1, 2)))(q, k, v)
    for a, b in zip(g, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=3e-5)


@_TPU_ONLY
def test_keep_fraction_statistic():
    rate = 0.1
    thresh16 = AF.dropout_thresh16(rate)
    bits = np.asarray(AF.dropout_bits(jnp.array([5], jnp.int32),
                                      4, 4, 32, 128))
    frac = float(np.mean(bits < np.uint32(thresh16 * 65536)))
    assert abs(frac - thresh16 / 65536.0) < 5e-3


def test_mha_flash_path_matches_xla_with_same_mask(monkeypatch):
    """Force the flash path inside layers.mha on CPU and check it against
    the XLA formulation fed the kernel's extracted dropout mask."""
    monkeypatch.setattr(L, "_use_flash_attn",
                        lambda mask, *dims: mask is not None)
    r = np.random.RandomState(1)
    dim_model = H * Dk
    p = L.init_mha(jax.random.PRNGKey(0), H, dim_model, Dk, Dv)
    x = jnp.asarray(r.randn(B, T, dim_model), jnp.float32)
    mask = jnp.asarray(r.rand(B, T, T) < 0.2)
    rate = 0.25
    rng = jax.random.PRNGKey(42)

    out = jax.jit(lambda x: L.mha(p, x, x, x, H, Dk, Dv, mask=mask,
                                  dropout_rate=rate, deterministic=False,
                                  rng=rng, dtype=jnp.float32))(x)

    # rebuild what the flash path computed, via the extracted bits
    rng1, sub = jax.random.split(rng)
    _, sub2 = jax.random.split(rng1)  # mha's post-projection out-dropout
    seed = AF.seed_from_key(sub)
    thresh16 = AF.dropout_thresh16(rate)
    scale = jnp.float32(65536.0 / thresh16)
    bits = AF.dropout_bits(seed, B, H, T, T)
    keep = jnp.asarray(
        (np.asarray(bits) < np.uint32(thresh16 * 65536)).reshape(B, H, T, T))

    q = L.dense(p["q"], x, jnp.float32).reshape(B, T, H, Dk)
    k = L.dense(p["k"], x, jnp.float32).reshape(B, T, H, Dk)
    v = L.dense(p["v"], x, jnp.float32).reshape(B, T, H, Dv)
    bias = jnp.where(mask, jnp.float32(-1e9), jnp.float32(0.0))
    attn = _ref(jnp.swapaxes(q, 1, 2), jnp.swapaxes(k, 1, 2),
                jnp.swapaxes(v, 1, 2), bias, keep, scale)
    core = jnp.swapaxes(attn, 1, 2).reshape(B, T, H * Dv)
    o = L.dense(p["out"], core.astype(jnp.float32),
                jnp.float32).astype(jnp.float32)
    o = L.dropout(sub2, o, rate, False)
    expect = L.layer_norm(p["ln"], o + x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(expect),
                               atol=2e-5)


def test_partitioned_rate0_under_mesh():
    """Batch partitioning: sharded rate-0 kernel equals unsharded."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    devs = jax.devices()
    if len(devs) < 2:
        pytest.skip("needs multiple devices")
    n = 2
    q, k, v, bias = _inputs()
    seed = jnp.array([7], jnp.int32)
    expect = jax.jit(lambda *a: AF.flash_mha_train(*a, 0.0))(
        q, k, v, bias, seed)
    mesh = Mesh(np.array(devs[:n]), ("dp",))
    shard = NamedSharding(mesh, P("dp"))
    rep = NamedSharding(mesh, P())
    with mesh:
        f = jax.jit(lambda q, k, v, b, s: AF.flash_mha_train(
            q, k, v, b, s, 0.0),
            in_shardings=(shard, shard, shard, shard, rep),
            out_shardings=shard)
        got = f(q, k, v, bias, seed)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expect),
                               atol=1e-6)


def test_flash_gate_excludes_vmem_overflow_shapes():
    """Long buckets (src ladder reaches 4000 frames) must fall back to
    the XLA path: the kernel's (H*Tq, Tk) VMEM scratch would not
    compile there. Boundary: flagship encoder shapes stay fused."""
    from end2end_asr_tpu.models.layers import flash_attn_fits

    assert flash_attn_fits(8, 200, 200)        # 800-frame bucket / vgg
    assert flash_attn_fits(8, 48, 200)         # decoder cross-attn
    assert not flash_attn_fits(8, 400, 400)    # 1600-frame bucket / vgg
    assert not flash_attn_fits(8, 1000, 1000)  # 4000-frame bucket / vgg
    assert not flash_attn_fits(8, 4000, 4000)  # no-frontend worst case
