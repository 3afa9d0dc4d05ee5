#!/usr/bin/env python3
"""Capture a REAL-TPU golden for the fused vgg block1 Pallas kernel.

CI runs ops/vgg_fused.py in interpret mode only (no TPU); this tool runs
the compiled forward AND backward on the real chip for a fixed input
(odd F, so the tail-block path is exercised) and commits the results as
tests/data/vgg_block1_golden.npz. The test
(tests/test_vgg_fused.py::test_block1_golden_from_real_tpu) then locks
interpret-mode numerics to the real-chip run.

Usage (on a TPU host):
  PYTHONPATH=/root/repo:/root/.axon_site python tools/capture_vgg_golden.py
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SEED = 23
B, F, T = 3, 33, 64   # odd F: exercises the tail block + edge masking
GOLDEN = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tests", "data", "vgg_block1_golden.npz")


def golden_input():
    rs = np.random.RandomState(SEED)
    return dict(
        spect=rs.randn(B, F, T).astype(np.float32),
        w1=(rs.randn(3, 3, 1, 64) * 0.2).astype(np.float32),
        b1=(rs.randn(64) * 0.1).astype(np.float32),
        w2=(rs.randn(3, 3, 64, 64) * 0.05).astype(np.float32),
        b2=(rs.randn(64) * 0.1).astype(np.float32),
        gup=rs.randn(B, F // 2, T // 2, 64).astype(np.float32),
    )


def compute(cdt_name: str):
    import jax
    import jax.numpy as jnp
    from end2end_asr_tpu.ops.vgg_fused import vgg_block1
    cdt = {"float32": jnp.float32, "bfloat16": jnp.bfloat16}[cdt_name]
    gi = {k: jnp.asarray(v) for k, v in golden_input().items()}

    out = vgg_block1(gi["spect"], gi["w1"], gi["b1"], gi["w2"], gi["b2"],
                     cdt)

    def loss(w1, b1, w2, b2):
        o = vgg_block1(gi["spect"], w1, b1, w2, b2, cdt)
        return jnp.sum(o.astype(jnp.float32) * gi["gup"])

    grads = jax.jit(jax.grad(loss, argnums=(0, 1, 2, 3)))(
        gi["w1"], gi["b1"], gi["w2"], gi["b2"])
    res = {"out": np.asarray(out.astype(jnp.float32))}
    for name, g in zip(("dw1", "db1", "dw2", "db2"), grads):
        res[name] = np.asarray(g.astype(jnp.float32))
    return res


def main():
    import jax
    assert jax.default_backend() != "cpu", "capture needs the real TPU"
    arrays = {}
    for cdt in ("float32", "bfloat16"):
        for k, v in compute(cdt).items():
            arrays[f"{cdt}_{k}"] = v
    np.savez(GOLDEN, **arrays)
    print(f"wrote {GOLDEN}: " + ", ".join(
        f"{k}{list(v.shape)}" for k, v in arrays.items()))


if __name__ == "__main__":
    main()
