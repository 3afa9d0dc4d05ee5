"""Batch partitioning of the Pallas kernels under an SPMD mesh.

Without ops/partition.py, a pallas_call under a sharded jit is
replicated (XLA cannot see through tpu_custom_call). These tests run the
wrapped kernels on the 8-virtual-device CPU mesh with batch-sharded
inputs and assert (a) numerical equality with the unsharded run and
(b) that the output actually carries the batch sharding (i.e. the
partitioner accepted the rule instead of falling back to replication).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from end2end_asr_tpu.ops.stft_pallas import batched_features_pallas


def _mesh():
    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs the 8-virtual-device CPU mesh")
    return Mesh(np.array(devs[:8]), ("data",))


def test_featurizer_partitions_on_batch():
    mesh = _mesh()
    SR = 8000
    n_fft, hop = 160, 80
    B, T_out = 16, 48
    n_pcm = (T_out - 1) * hop
    rs = np.random.RandomState(0)
    pcm = rs.randn(B, n_pcm + n_fft).astype(np.float32)
    frames = np.full((B,), T_out, np.int32)
    frames[::3] = T_out - 5

    ref = np.asarray(batched_features_pallas(
        jnp.asarray(pcm), jnp.asarray(frames), n_fft, hop, "hamming",
        T_out))

    sh = NamedSharding(mesh, P("data"))
    pcm_s = jax.device_put(jnp.asarray(pcm), sh)
    fr_s = jax.device_put(jnp.asarray(frames), sh)
    with mesh:
        out = batched_features_pallas(pcm_s, fr_s, n_fft, hop, "hamming",
                                      T_out)
    assert isinstance(out.sharding, NamedSharding)
    assert out.sharding.spec[0] == "data", out.sharding
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-5, atol=1e-5)


def test_vgg_block1_partitions_and_grads_match():
    from end2end_asr_tpu.ops.vgg_fused import vgg_block1
    mesh = _mesh()
    rs = np.random.RandomState(1)
    B, F, T = 16, 16, 16
    spect = jnp.asarray(rs.randn(B, F, T), jnp.float32)
    w1 = jnp.asarray(rs.randn(3, 3, 1, 64) * 0.2, jnp.float32)
    b1 = jnp.asarray(rs.randn(64) * 0.1, jnp.float32)
    w2 = jnp.asarray(rs.randn(3, 3, 64, 64) * 0.05, jnp.float32)
    b2 = jnp.asarray(rs.randn(64) * 0.1, jnp.float32)
    gup = jnp.asarray(rs.randn(B, F // 2, T // 2, 64), jnp.float32)

    def loss(spect, w1, b1, w2, b2):
        out = vgg_block1(spect, w1, b1, w2, b2, jnp.float32)
        return jnp.sum(out.astype(jnp.float32) * gup_ref[0])

    gup_ref = [gup]
    ref_out = np.asarray(vgg_block1(spect, w1, b1, w2, b2, jnp.float32))
    ref_g = jax.grad(loss, argnums=(1, 2, 3, 4))(spect, w1, b1, w2, b2)

    sh = NamedSharding(mesh, P("data"))
    spect_s = jax.device_put(spect, sh)
    gup_ref[0] = jax.device_put(gup, sh)
    with mesh:
        out = jax.jit(vgg_block1, static_argnums=5)(
            spect_s, w1, b1, w2, b2, jnp.float32)
        g = jax.jit(jax.grad(loss, argnums=(1, 2, 3, 4)))(
            spect_s, w1, b1, w2, b2)
    assert out.sharding.spec[0] == "data", out.sharding
    np.testing.assert_allclose(np.asarray(out), ref_out, rtol=1e-5,
                               atol=1e-5)
    for name, a, b in zip("w1 b1 w2 b2".split(), g, ref_g):
        scale = max(np.abs(np.asarray(b)).max(), 1e-6)
        np.testing.assert_allclose(
            np.asarray(a) / scale, np.asarray(b) / scale,
            rtol=0, atol=1e-5, err_msg=name)


def test_pool_backward_partitions():
    from end2end_asr_tpu.ops.pool_vjp import max_pool2, _pool_fwd
    mesh = _mesh()
    rs = np.random.RandomState(2)
    y = jnp.asarray(rs.randn(16, 6, 16, 64), jnp.float32)
    g = jnp.asarray(rs.randn(16, 3, 8, 64), jnp.float32)

    def loss(y, g):
        return jnp.sum(max_pool2(y).astype(jnp.float32) * g)

    ref = np.asarray(jax.grad(loss)(y, g))
    sh = NamedSharding(mesh, P("data"))
    with mesh:
        got = jax.jit(jax.grad(loss))(jax.device_put(y, sh),
                                      jax.device_put(g, sh))
    assert got.sharding.spec[0] == "data", got.sharding
    np.testing.assert_array_equal(np.asarray(got), ref)
