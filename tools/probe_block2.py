"""A/B probe for the vgg block2 backward strategy (real TPU).

Measures, at flagship shapes (B=12, F2=80, T2=400), scan-truth style
(carry threaded so nothing hoists):
  A  composite fwd+bwd        — production today (BLOCK2_ENABLED=False)
  Af composite fwd only
  B  fused Pallas fwd only    — the already-built vgg_block2 kernel
  C  saved-intermediate bwd   — XLA bwd from (x, y3, out, idx, dout):
     idx-based unpool + vjp convs, NO rematerialization
The hybrid candidate costs ~ B + C + y3/idx emission (~0.2 ms HBM).
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

B, F2, T2, CI, CO = 12, 80, 400, 64, 128
F4, T4 = F2 // 2, T2 // 2
DT = jnp.bfloat16
K = 30


def conv(x, w, dtype=DT):
    return jax.lax.conv_general_dilated(
        x.astype(dtype), w.astype(dtype), window_strides=(1, 1),
        padding="SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))


def pool_idx(y):
    """maxpool2x2 + first-wins argmax idx (B,F4,T4,C) int32 0..3."""
    y4 = y.reshape(B, F4, 2, T4, 2, CO)
    cand = jnp.stack([y4[:, :, 0, :, 0], y4[:, :, 0, :, 1],
                      y4[:, :, 1, :, 0], y4[:, :, 1, :, 1]], axis=-1)
    p = jnp.max(cand, axis=-1)
    idx = jnp.argmax(cand, axis=-1).astype(jnp.int32)
    return p, idx


def fwd(x, w3, b3, w4, b4):
    y3 = jax.nn.relu(conv(x, w3) + b3.astype(DT))
    y4 = conv(y3, w4)
    p, idx = pool_idx(y4)
    out = jax.nn.relu(p + b4.astype(DT))
    return out, y3, idx


def composite_loss(x, w3, b3, w4, b4, g):
    out, _, _ = fwd(x, w3, b3, w4, b4)
    return jnp.sum(out.astype(jnp.float32) * g)


def saved_bwd(x, y3, out, idx, dout, w3, w4):
    """Backward from saved intermediates; returns (dx, dW3, db3, dW4,
    db4)."""
    dp = jnp.where(out > 0, dout, 0.0).astype(DT)         # (B,F4,T4,C)
    db4 = jnp.sum(dp.astype(jnp.float32), axis=(0, 1, 2))
    sel = jax.nn.one_hot(idx, 4, dtype=DT) * dp[..., None]  # (B,F4,T4,C,4)
    dy4 = (sel.transpose(0, 1, 2, 4, 3)
           .reshape(B, F4, T4, 2, 2, CO)
           .transpose(0, 1, 3, 2, 4, 5)
           .reshape(B, F2, T2, CO))
    _, vjp_w4 = jax.vjp(lambda w: conv(y3, w), w4)
    dW4, = vjp_w4(dy4)
    _, vjp_y3 = jax.vjp(lambda y: conv(y, w4), y3)
    dy3, = vjp_y3(dy4)
    dy3 = jnp.where(y3 > 0, dy3, 0.0).astype(DT)
    db3 = jnp.sum(dy3.astype(jnp.float32), axis=(0, 1, 2))
    _, vjp_w3 = jax.vjp(lambda w: conv(x, w), w3)
    dW3, = vjp_w3(dy3)
    _, vjp_x = jax.vjp(lambda xx: conv(xx, w3), x)
    dx, = vjp_x(dy3)
    return dx, dW3, db3, dW4, db4


def timeit(name, fn, *args):
    """Scan-truth: K sequential applications. The carry PERTURBS the
    first array input each iteration (fn must add it in) so the body is
    not loop-invariant — XLA hoists fn(const_args) out of the scan
    otherwise and you measure nothing."""
    @jax.jit
    def many(carry, args):
        def body(c, _):
            out = fn(c, *args)
            # reduce to a scalar carry so the next iteration depends on
            # this one and nothing is hoisted/DCE'd
            leaves = jax.tree_util.tree_leaves(out)
            s = sum(jnp.sum(l.astype(jnp.float32)) for l in leaves)
            return s * 1e-30, None
        c, _ = jax.lax.scan(body, carry, None, length=K)
        return c
    c0 = jnp.zeros((), jnp.float32)
    r = many(c0, args)
    float(r)  # sync (block_until_ready lies through the tunnel)
    t0 = time.perf_counter()
    r = many(c0, args)
    float(r)
    dt = (time.perf_counter() - t0) / K * 1000
    print(f"{name:36s} {dt:7.3f} ms")
    return dt


def main():
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.randn(B, F2, T2, CI), DT) * 0.5
    w3 = jnp.asarray(rs.randn(3, 3, CI, CO) * 0.05, jnp.float32)
    b3 = jnp.asarray(rs.randn(CO) * 0.01, jnp.float32)
    w4 = jnp.asarray(rs.randn(3, 3, CO, CO) * 0.03, jnp.float32)
    b4 = jnp.asarray(rs.randn(CO) * 0.01, jnp.float32)
    g = jnp.asarray(rs.randn(B, F4, T4, CO), jnp.float32) * 0.1

    grad_fn = jax.grad(composite_loss, argnums=(0, 1, 2, 3, 4))

    out, y3, idx = jax.jit(fwd)(x, w3, b3, w4, b4)
    dout = g.astype(jnp.float32)

    def mix(c, a):
        return (a + c.astype(a.dtype)).astype(a.dtype)

    timeit("A  composite fwd+bwd",
           lambda c, xx, *a: grad_fn(mix(c, xx), *a), x, w3, b3, w4, b4,
           g)
    timeit("Af composite fwd only",
           lambda c, xx, *a: fwd(mix(c, xx), *a)[0], x, w3, b3, w4, b4)
    timeit("C  saved-intermediate bwd",
           lambda c, xx, *a: saved_bwd(mix(c, xx), *a),
           x, y3, out, idx, dout, w3, w4)

    try:
        from end2end_asr_tpu.ops.vgg_fused import vgg_block2, supported2
        if supported2(F2 * 2, T2 * 2):
            xt = jnp.transpose(x, (0, 1, 3, 2))  # (B,F2,C,T2) kernel-native
            timeit("B  fused Pallas fwd (existing)",
                   lambda c, xx, *a: vgg_block2(mix(c, xx), *a),
                   xt, w3, b3, w4, b4)
            timeit("B' fused Pallas fwd+bwd (existing, gated)",
                   lambda c, xx, *a: jax.grad(
                       lambda xi, w3i, b3i, w4i, b4i: jnp.sum(
                           vgg_block2(xi, w3i, b3i, w4i, b4i)
                           .astype(jnp.float32)),
                       argnums=(0, 1, 2, 3, 4))(mix(c, xx), *a),
                   xt, w3, b3, w4, b4)
    except Exception as e:
        print("fused probe failed:", e)


if __name__ == "__main__":
    main()
