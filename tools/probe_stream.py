#!/usr/bin/env python3
"""HBM streaming-rate probe: is XLA's ~390 GB/s elementwise-chain rate
(BENCH_NOTES round-4 Adam floor analysis) the chip's practical ceiling,
or does a Pallas streaming kernel move bytes meaningfully faster?

Three arms, each on flat f32 arrays sized like the full 39M-param
model's Adam working set:
  1. xla_copy      — jit(lambda x: x + 1)                (R+W, 8 B/elt)
  2. xla_adam      — the exact Adam chain XLA compiles    (28 B/elt)
  3. pallas_copy   — same as 1, Pallas grid-pipelined
  4. pallas_adam   — same as 2, Pallas grid-pipelined
If pallas_adam ≈ xla_adam, the 390 GB/s is the platform rate and the
Adam floor argument stands as written. If Pallas is >25% faster, a
fused-Adam kernel over the big leaves is worth building (potential
~1 ms of the 2.9 ms update).

Run on the real chip: python tools/probe_stream.py
"""

import functools
import time

from end2end_asr_tpu.utils.platform import honor_env_platform
honor_env_platform()

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N_ROWS, N_COLS = 38400, 1024       # 39.3M f32 = 157 MB per array
BLK = 128                           # (128, 1024) f32 = 0.5 MB per ref
                                    # (7 refs × 2 pipeline stages = 7 MB VMEM)
LR, B1, B2, EPS = 1e-3, 0.9, 0.98, 1e-9


def _sync(x):
    # block_until_ready does not block through the tunnel; host-read does
    return float(jnp.sum(x[0, :8]))


def _time(fn, *args, iters=30):
    out = fn(*args)
    _sync(out[0] if isinstance(out, tuple) else out)
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    _sync(out[0] if isinstance(out, tuple) else out)
    return (time.time() - t0) / iters


# --- copy arms ---------------------------------------------------------

@jax.jit
def xla_copy(x):
    return x + 1.0


def _copy_kernel(x_ref, o_ref):
    o_ref[...] = x_ref[...] + 1.0


@jax.jit
def pallas_copy(x):
    return pl.pallas_call(
        _copy_kernel,
        grid=(N_ROWS // BLK,),
        in_specs=[pl.BlockSpec((BLK, N_COLS), lambda i: (i, 0))],
        out_specs=pl.BlockSpec((BLK, N_COLS), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((N_ROWS, N_COLS), jnp.float32),
    )(x)


# --- adam arms ---------------------------------------------------------

def _adam_math(p, m, v, g, t):
    m = B1 * m + (1.0 - B1) * g
    v = B2 * v + (1.0 - B2) * g * g
    mhat = m / (1.0 - B1 ** t)
    vhat = v / (1.0 - B2 ** t)
    return p - LR * mhat / (jnp.sqrt(vhat) + EPS), m, v


@functools.partial(jax.jit, donate_argnums=(0, 1, 2))
def xla_adam(p, m, v, g, t):
    return _adam_math(p, m, v, g, t)


def _adam_kernel(t_ref, p_ref, m_ref, v_ref, g_ref, po_ref, mo_ref, vo_ref):
    t = t_ref[0]
    p2, m2, v2 = _adam_math(p_ref[...], m_ref[...], v_ref[...],
                            g_ref[...], t)
    po_ref[...] = p2
    mo_ref[...] = m2
    vo_ref[...] = v2


@functools.partial(jax.jit, donate_argnums=(0, 1, 2))
def pallas_adam(p, m, v, g, t):
    spec = pl.BlockSpec((BLK, N_COLS), lambda i: (i, 0))
    shape = jax.ShapeDtypeStruct((N_ROWS, N_COLS), jnp.float32)
    return pl.pallas_call(
        _adam_kernel,
        grid=(N_ROWS // BLK,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] + [spec] * 4,
        out_specs=(spec, spec, spec),
        out_shape=(shape, shape, shape),
        input_output_aliases={1: 0, 2: 1, 3: 2},
    )(jnp.full((1,), t, jnp.float32), p, m, v, g)


def main():
    k = jax.random.PRNGKey(0)
    ks = jax.random.split(k, 4)
    p, m, v, g = (jax.random.normal(kk, (N_ROWS, N_COLS), jnp.float32)
                  for kk in ks)
    v = jnp.abs(v)
    nbytes = N_ROWS * N_COLS * 4

    dt = _time(xla_copy, p)
    print(f"xla_copy    : {dt*1e3:7.3f} ms  {2*nbytes/dt/1e9:6.1f} GB/s")
    dt = _time(pallas_copy, p)
    print(f"pallas_copy : {dt*1e3:7.3f} ms  {2*nbytes/dt/1e9:6.1f} GB/s")

    # exactness cross-check before timing donated arms
    pa = pallas_adam(p + 0, m + 0, v + 0, g, 3.0)
    xa = xla_adam(p + 0, m + 0, v + 0, g, 3.0)
    for a, b in zip(pa, xa):
        err = float(jnp.max(jnp.abs(a - b)))
        assert err < 1e-6, err
    print("adam exactness: pallas == xla (1e-6)")

    def xla_arm(pp, mm, vv):
        return xla_adam(pp, mm, vv, g, 3.0)

    def pl_arm(pp, mm, vv):
        return pallas_adam(pp, mm, vv, g, 3.0)

    for name, fn in (("xla_adam", xla_arm), ("pallas_adam", pl_arm)):
        pp, mm, vv = p + 0, m + 0, v + 0
        _sync(fn(pp + 0, mm + 0, vv + 0)[0])  # compile
        t0 = time.time()
        iters = 30
        for _ in range(iters):
            pp, mm, vv = fn(pp, mm, vv)
        _sync(pp)
        dt = (time.time() - t0) / iters
        print(f"{name:12s}: {dt*1e3:7.3f} ms  {7*nbytes/dt/1e9:6.1f} GB/s"
              f"  (28 B/param)")


if __name__ == "__main__":
    main()
