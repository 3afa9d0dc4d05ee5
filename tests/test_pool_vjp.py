"""Pallas max-pool backward vs XLA select_and_scatter (reference grad).

The reference trains through torch MaxPool2d (models/asr/transformer.py:
36-44) whose backward sends each pooled gradient to the first argmax of
its 2x2 window; XLA's reduce_window grad (select-and-scatter with ge)
has identical semantics. ops/pool_vjp.py must match both — including on
exact ties, which bf16 activations produce constantly.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from end2end_asr_tpu.ops.pool_vjp import max_pool2, _pool_fwd


def _xla_grad(y, g):
    def loss(y):
        return jnp.sum(_pool_fwd(y).astype(jnp.float32) * g)
    return jax.grad(loss)(y)


def _pallas_grad(y, g):
    def loss(y):
        return jnp.sum(max_pool2(y).astype(jnp.float32) * g)
    return jax.grad(loss)(y)


@pytest.mark.parametrize("shape", [(2, 6, 16, 64), (2, 7, 16, 64),
                                   (1, 4, 8, 128), (3, 5, 32, 64)])
@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_pool_backward_matches_select_and_scatter(shape, dtype):
    B, F, T, C = shape
    rng = np.random.RandomState(hash(shape) % 2**31)
    # quantize to few distinct values => dense exact ties
    y = jnp.asarray(
        np.round(rng.randn(B, F, T, C) * 2) / 2, dtype)
    g = jnp.asarray(rng.randn(B, F // 2, T // 2, C), jnp.float32)

    out_p = np.asarray(max_pool2(y).astype(jnp.float32))
    out_x = np.asarray(_pool_fwd(y).astype(jnp.float32))
    np.testing.assert_array_equal(out_p, out_x)

    gp = np.asarray(_pallas_grad(y, g).astype(jnp.float32))
    gx = np.asarray(_xla_grad(y, g).astype(jnp.float32))
    np.testing.assert_array_equal(gp, gx)


def test_pool_odd_time_falls_back(monkeypatch):
    # odd T: gate returns the plain reduce_window path (autodiffable)
    y = jnp.asarray(np.random.RandomState(0).randn(1, 4, 7, 64), jnp.float32)
    g = jnp.ones((1, 2, 3, 64), jnp.float32)
    gp = np.asarray(_pallas_grad(y, g))
    gx = np.asarray(_xla_grad(y, g))
    np.testing.assert_array_equal(gp, gx)


def test_pool_under_jit_and_vmap_scan():
    # the pool runs inside jitted scanned train steps — smoke that path
    y = jnp.asarray(np.random.RandomState(1).randn(2, 6, 16, 64),
                    jnp.bfloat16)
    g = jnp.ones((2, 3, 8, 64), jnp.float32)

    @jax.jit
    def f(y):
        def body(acc, _):
            return acc + jnp.sum(_pallas_grad_inner(y)), None
        return jax.lax.scan(body, jnp.float32(0), jnp.arange(3))[0]

    def _pallas_grad_inner(y):
        return jnp.sum(jax.grad(
            lambda y: jnp.sum(max_pool2(y).astype(jnp.float32) * g))(y)
            .astype(jnp.float32))

    assert np.isfinite(float(f(y)))
