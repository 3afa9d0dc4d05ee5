"""Saved-intermediate block2 VJP (models/frontend._block2_saved) vs the
XLA-autodiff composite it replaces: identical forward, matching grads.

The custom path keeps y3 + the pool argmax from the forward, so its
backward skips rematerialization and select_and_scatter; values must be
indistinguishable from the composite (same convs, same first-wins
tie-breaking)."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from end2end_asr_tpu.models.frontend import (_block2_saved, _conv,
                                             _conv_pool_relu)

B, F2, T2, CI, CO = 2, 10, 16, 64, 128


def composite(x, w3, b3, w4, b4, dtype):
    y = jax.nn.relu(_conv({"w": w3, "b": b3}, x, (1, 1), "SAME", dtype))
    return _conv_pool_relu({"w": w4, "b": b4}, y, dtype)


def _data(seed=0):
    rs = np.random.RandomState(seed)
    return (jnp.asarray(rs.randn(B, F2, T2, CI), jnp.float32) * 0.5,
            jnp.asarray(rs.randn(3, 3, CI, CO) * 0.05, jnp.float32),
            jnp.asarray(rs.randn(CO) * 0.01, jnp.float32),
            jnp.asarray(rs.randn(3, 3, CO, CO) * 0.03, jnp.float32),
            jnp.asarray(rs.randn(CO) * 0.01, jnp.float32),
            jnp.asarray(rs.randn(B, F2 // 2, T2 // 2, CO),
                        jnp.float32))


@pytest.mark.parametrize("dtype,atol_f,atol_g", [
    (jnp.float32, 0.0, 2e-5),
    (jnp.bfloat16, 0.0, 2e-2),
])
def test_block2_saved_matches_composite(dtype, atol_f, atol_g):
    x, w3, b3, w4, b4, g = _data()
    x = x.astype(dtype)

    ref = jax.jit(functools.partial(composite, dtype=dtype))(
        x, w3, b3, w4, b4)
    got = jax.jit(functools.partial(_block2_saved, dtype=dtype))(
        x, w3, b3, w4, b4)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(ref, np.float32), atol=atol_f)

    def loss(fn):
        def f(x, w3, b3, w4, b4):
            out = fn(x, w3, b3, w4, b4)
            return jnp.sum(out.astype(jnp.float32) * g)
        return jax.jit(jax.grad(f, argnums=(0, 1, 2, 3, 4)))

    ref_g = loss(functools.partial(composite, dtype=dtype))(
        x, w3, b3, w4, b4)
    got_g = loss(functools.partial(_block2_saved, dtype=dtype))(
        x, w3, b3, w4, b4)
    names = ["dx", "dw3", "db3", "dw4", "db4"]
    for n, a, b in zip(names, got_g, ref_g):
        a = np.asarray(a, np.float32)
        b = np.asarray(b, np.float32)
        scale = max(1.0, float(np.abs(b).max()))
        np.testing.assert_allclose(a, b, atol=atol_g * scale, err_msg=n)


def test_block2_saved_odd_tail():
    """Odd F2: the pool drops the last row on both paths."""
    x, w3, b3, w4, b4, _ = _data(1)
    x = x[:, :F2 - 1]
    ref = jax.jit(functools.partial(composite, dtype=jnp.float32))(
        x, w3, b3, w4, b4)
    got = jax.jit(functools.partial(_block2_saved, dtype=jnp.float32))(
        x, w3, b3, w4, b4)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref))


def test_frontend_uses_saved_block2():
    """apply_frontend (vgg, unfused-block1 CPU path) output is unchanged
    by the saved-VJP block2 and grads are finite."""
    from end2end_asr_tpu.models import frontend as FE
    key = jax.random.PRNGKey(0)
    params, state = FE.init_frontend(key, "vgg_cnn")
    spect = jnp.asarray(np.random.RandomState(2).randn(2, 20, 32),
                        jnp.float32)

    def run(flag):
        old = FE.BLOCK2_SAVED_VJP
        FE.BLOCK2_SAVED_VJP = flag
        try:
            fn = lambda p: jnp.sum(FE.apply_frontend(
                p, state, spect, "vgg_cnn", dtype=jnp.float32)[0])
            v, gr = jax.value_and_grad(fn)(params)
        finally:
            FE.BLOCK2_SAVED_VJP = old
        return v, gr

    v1, g1 = run(True)
    v0, g0 = run(False)
    assert float(v1) == pytest.approx(float(v0), rel=1e-6)
    flat1 = jax.tree_util.tree_leaves(g1)
    flat0 = jax.tree_util.tree_leaves(g0)
    for a, b in zip(flat1, flat0):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-4 * max(
                                       1.0, float(jnp.abs(b).max())))
