"""A/B probe (measured dead-end, kept for the record): conv3 consuming
vgg_block1_t's native (B,F',C,T') layout via lhs_spec "NHCW" vs the
production transpose path (models/frontend.py vgg fused1 branch).

Result on v5e (same session, back-to-back):
  fwd max|diff| 2e-3 (bf16 conv order noise), grad HLO byte-identical,
  base 11.48 / nhcw 11.44 ms fwd+bwd standalone — a wash.  XLA
  canonicalizes custom conv dimension numbers back into the same
  relayout copies; the Pallas/conv boundary copies are layout
  assignment, not logical transposes, so skipping the jnp.transpose
  does not remove them.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from end2end_asr_tpu.models import frontend as fe
from end2end_asr_tpu.ops.vgg_fused import vgg_block1, vgg_block1_t

B, F, T = 12, 161, 800
DT = jnp.bfloat16
params, state = fe.init_frontend(jax.random.PRNGKey(0), "vgg_cnn")
spect = jax.random.normal(jax.random.PRNGKey(1), (B, F, T), jnp.float32)


def _conv(p, x, lhs_spec):
    y = jax.lax.conv_general_dilated(
        x.astype(DT), p["w"].astype(DT), window_strides=(1, 1),
        padding="SAME", dimension_numbers=(lhs_spec, "HWIO", "NHWC"))
    return y + p["b"].astype(y.dtype)


def tail(x, p):
    """conv4 + pool + bias + relu + flatten, shared by both arms."""
    x = fe._conv_pool_relu(p["conv4"], x, DT)
    Bx, Fp, Tp, C = x.shape
    x = jnp.transpose(x, (0, 2, 3, 1)).reshape(Bx, Tp, C * Fp)
    return x.astype(jnp.float32)


def block(p, s, nhcw: bool):
    s = jax.lax.stop_gradient(s)
    if nhcw:
        x_t = vgg_block1_t(s, p["conv1"]["w"], p["conv1"]["b"],
                           p["conv2"]["w"], p["conv2"]["b"], DT)
        x = jax.nn.relu(_conv(p["conv3"], x_t, "NHCW"))
    else:
        x = vgg_block1(s, p["conv1"]["w"], p["conv1"]["b"],
                       p["conv2"]["w"], p["conv2"]["b"], DT)
        x = jax.nn.relu(_conv(p["conv3"], x, "NHWC"))
    return tail(x, p)


def run(nhcw: bool):
    @jax.jit
    def loss_grad(p, s):
        def f(p):
            return jnp.sum(block(p, s, nhcw) ** 2)
        return jax.value_and_grad(f)(p)

    l, g = loss_grad(params, spect)
    return float(l), g, loss_grad


l0, g0, lg0 = run(False)
print("base compiled; loss", l0, flush=True)
l1, g1, lg1 = run(True)
print("nhcw compiled; loss", l1, flush=True)
flat0 = [np.asarray(x) for x in jax.tree_util.tree_leaves(g0)]
flat1 = [np.asarray(x) for x in jax.tree_util.tree_leaves(g1)]
print("grad max|diff|:", max(np.max(np.abs(a - b))
                             for a, b in zip(flat0, flat1)), flush=True)


def bench(lg, n=30):
    l, _ = lg(params, spect)
    float(l)
    t0 = time.perf_counter()
    for _ in range(n):
        l, _ = lg(params, spect)
    float(l)
    return (time.perf_counter() - t0) / n * 1e3


for name, lg in (("base", lg0), ("nhcw", lg1), ("base", lg0), ("nhcw", lg1)):
    print(f"{name}: {bench(lg):.3f} ms fwd+bwd")
