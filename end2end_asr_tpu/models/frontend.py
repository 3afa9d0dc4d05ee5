"""Conv feature front-ends: `emb_cnn` (deepspeech2-style) and `vgg_cnn`.

Reference: models/asr/transformer.py:32-53 (construction) and :70-76
(apply + reshape). The reference runs NCHW with H=freq, W=time; here the
layout is NHWC — (B, F, T, C) — which is the layout XLA:TPU tiles best.
The output feature ordering after flattening matches the reference's
`view(B, C*F', T').transpose(1,2)`, i.e. feature index = c * F' + f, so
converted reference checkpoints line up exactly.

BatchNorm (emb_cnn only) is functional: running stats live in a `state`
pytree returned alongside the params; train mode normalizes with batch
statistics and returns updated running stats (torch momentum 0.1 semantics).
"""

from __future__ import annotations

import functools
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from end2end_asr_tpu.models.layers import xavier_uniform, torch_bias_uniform
from end2end_asr_tpu.ops.pool_vjp import max_pool2
from end2end_asr_tpu.ops.vgg_fused import (BLOCK2_ENABLED as _BLOCK2_ENABLED,
                                           vgg_block1, vgg_block1_t,
                                           vgg_block2,
                                           supported as _block1_shapes_ok,
                                           supported2 as _block2_shapes_ok)


def _use_fused_block1(spect: jnp.ndarray) -> bool:
    _, F, T = spect.shape
    # Only the TPU backend can compile the pltpu kernel; CPU tests use
    # interpret mode explicitly, any other backend takes the composite.
    return jax.default_backend() == "tpu" and _block1_shapes_ok(F, T)

Params = Dict[str, object]

BN_EPS = 1e-5
BN_MOMENTUM = 0.1


def _init_conv(key, kh: int, kw: int, c_in: int, c_out: int) -> Params:
    kw_key, kb_key = jax.random.split(key)
    fan_in = c_in * kh * kw
    fan_out = c_out * kh * kw
    return {
        "w": xavier_uniform(kw_key, (kh, kw, c_in, c_out), fan_in, fan_out),
        "b": torch_bias_uniform(kb_key, (c_out,), fan_in),
    }


def _conv_nobias(p: Params, x: jnp.ndarray, stride: Tuple[int, int],
                 padding, dtype=jnp.bfloat16) -> jnp.ndarray:
    # compute-dtype in/out (XLA's TPU conv accumulates f32 internally for
    # bf16 inputs); preferred_element_type upcasting breaks the transpose
    # rule under grad with mixed dtypes
    return jax.lax.conv_general_dilated(
        x.astype(dtype), p["w"].astype(dtype),
        window_strides=stride, padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def _conv(p: Params, x: jnp.ndarray, stride: Tuple[int, int],
          padding, dtype=jnp.bfloat16) -> jnp.ndarray:
    y = _conv_nobias(p, x, stride, padding, dtype)
    return y + p["b"].astype(y.dtype)


def _max_pool2(x: jnp.ndarray) -> jnp.ndarray:
    # Measured on v5e (flagship train step, utt/s/chip end-to-end):
    # reduce_window 512 > packed space-to-depth conv2 (two time phases
    # as 128 channels + channel-half max, exact) 489 > reshape+max ~440
    # (odd-size reshape breaks tiling) > strided-view max 263 (sublane
    # strided slices are pathological); a custom equality-mask vjp
    # (jnp.repeat upsample) also LOST to select_and_scatter (430 vs
    # 512). Keep reduce_window. (The vgg path no longer calls this at
    # all — see _conv_pool_relu's phase-conv formulation.)
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max,
        window_dimensions=(1, 2, 2, 1), window_strides=(1, 2, 2, 1),
        padding="VALID")


def _conv_pool_relu(p: Params, x: jnp.ndarray, dtype=jnp.bfloat16) -> jnp.ndarray:
    """relu(maxpool2x2(conv_SAME(x, w)) + b).

    Measured dead-ends (do NOT redo):
    - Splitting the conv into its four pool phases as stride-2 convs
      with explicit first-wins masks wins standalone (12.8 -> 9.9 ms
      fwd+bwd for the 64x64 block on v5e) but LOSES in the full train
      step (28.3 -> 34.8 ms): XLA materializes the full-res input-grad
      once per phase (4x 198 MB) instead of fusing the four dilated
      transposed convs.
    - The Pallas scatter backward used here (ops/pool_vjp.py) is itself
      2.2x faster than XLA's select_and_scatter (1.3 vs 2.9 ms) but the
      win is eaten by boundary taxes: XLA relayouts the conv output
      {3,0,2,1}->{3,2,1,0} (1.4 ms) and un-fuses the pool-side reshapes
      (2x ~1 ms) around the custom call. Net in-step: ~even (28.3 ->
      28.8 ms). It stays because the parity tests pin its semantics and
      it is the stepping stone for the fused block kernel.
    """
    y = _conv_nobias(p, x, (1, 1), "SAME", dtype)
    y = max_pool2(y)
    return jax.nn.relu(y + p["b"].astype(y.dtype))


# Saved-intermediate block2 (conv3+relu+conv4+pool+bias+relu as ONE
# custom_vjp): the forward runs the same XLA convs as the composite but
# additionally keeps y3 (the conv3 activation) and the pool's first-wins
# argmax; the backward then skips XLA's y3 rematerialization and replaces
# select_and_scatter with a one-hot unpool routed by the saved indices.
# Measured on v5e (round 3, same-session A/B): STANDALONE it wins —
# composite fwd+bwd 6.56 ms vs fwd-with-idx 2.80 + saved bwd 2.84
# (tools/probe_block2.py) — but IN-STEP it loses, 19.89 vs 19.10 ms
# scan-truth: forcing y3/out/idx as residuals changes what XLA saves
# and breaks fusions worth more than the 0.9 ms saved (same lesson as
# the Pallas pool backward: partial replacements pay boundary taxes).
# Gated OFF; kept + parity-tested (test_block2_saved.py) as the
# documented attempt. The fully-fused Pallas block2 backward is also
# gated off (ops/vgg_fused.py BLOCK2_ENABLED — the trace shows XLA's
# in-step block2 convs already run at ~121 TF/s; the recoverable heat
# is the ~1 ms of relayout copies at the kernel/conv boundary, not the
# convs).
# RE-ENABLE PRECONDITION: the saved backward's unpool reshape assumes
# even post-block1 dims — with an odd time/freq (e.g. T2=201) the
# one-hot `sel` covers only the cropped 2*F4 columns while the reshape
# targets the uncropped shape (trace-time element-count mismatch), and
# dy4 is not re-padded to y4's full shape for the cropped tail. Fix and
# add an odd-dim case to test_block2_saved.py before flipping this on.
BLOCK2_SAVED_VJP = False


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def _block2_saved(x, w3, b3, w4, b4, dtype):
    out, _ = _block2_saved_fwd_impl(x, w3, b3, w4, b4, dtype)
    return out


def _pool2_idx(y4):
    """maxpool2x2 VALID + first-wins argmax over the window in row-major
    order (matches torch MaxPool2d / select_and_scatter tie-breaking).
    y4: (B, F, T, C) -> ((B, F2, T2, C), idx int8 in 0..3)."""
    B, F, T, C = y4.shape
    F2, T2 = F // 2, T // 2
    y4 = y4[:, :F2 * 2, :T2 * 2]
    w = y4.reshape(B, F2, 2, T2, 2, C)
    cand = jnp.stack([w[:, :, 0, :, 0], w[:, :, 0, :, 1],
                      w[:, :, 1, :, 0], w[:, :, 1, :, 1]], axis=-1)
    p = jnp.max(cand, axis=-1)
    idx = jnp.argmax(cand, axis=-1).astype(jnp.int8)
    return p, idx


def _block2_saved_fwd_impl(x, w3, b3, w4, b4, dtype):
    y3 = jax.nn.relu(
        _conv({"w": w3, "b": b3}, x, (1, 1), "SAME", dtype))
    y4 = _conv_nobias({"w": w4}, y3, (1, 1), "SAME", dtype)
    p, idx = _pool2_idx(y4)
    out = jax.nn.relu(p + b4.astype(p.dtype))
    return out, (x, w3, w4, y3, out, idx)


def _block2_saved_fwd(x, w3, b3, w4, b4, dtype):
    out, res = _block2_saved_fwd_impl(x, w3, b3, w4, b4, dtype)
    return out, res


def _block2_saved_bwd(dtype, res, dout):
    x, w3, w4, y3, out, idx = res
    B, F2, T2, C = y3.shape
    F4, T4 = F2 // 2, T2 // 2
    dp = jnp.where(out > 0, dout, 0.0).astype(dtype)
    db4 = jnp.sum(dp.astype(jnp.float32), axis=(0, 1, 2))
    # unpool: route each pooled grad to its argmax position
    sel = (jax.nn.one_hot(idx, 4, dtype=dtype)
           * dp[..., None])                          # (B,F4,T4,C,4)
    dy4 = (sel.transpose(0, 1, 2, 4, 3)
           .reshape(B, F4, T4, 2, 2, C)
           .transpose(0, 1, 3, 2, 4, 5)
           .reshape(B, F2, T2, C))
    conv4 = lambda y, w: _conv_nobias({"w": w}, y, (1, 1), "SAME", dtype)
    _, vjp_w4 = jax.vjp(lambda w: conv4(y3, w), w4)
    dW4, = vjp_w4(dy4)
    _, vjp_y3 = jax.vjp(lambda y: conv4(y, w4), y3)
    dy3, = vjp_y3(dy4)
    dy3 = jnp.where(y3 > 0, dy3, 0.0).astype(dtype)
    db3 = jnp.sum(dy3.astype(jnp.float32), axis=(0, 1, 2))
    conv3 = lambda xx, w: _conv_nobias({"w": w}, xx, (1, 1), "SAME",
                                       dtype)
    _, vjp_w3 = jax.vjp(lambda w: conv3(x, w), w3)
    dW3, = vjp_w3(dy3)
    _, vjp_x = jax.vjp(lambda xx: conv3(xx, w3), x)
    dx, = vjp_x(dy3)
    return (dx.astype(x.dtype), dW3.astype(w3.dtype), db3,
            dW4.astype(w4.dtype), db4)


_block2_saved.defvjp(_block2_saved_fwd, _block2_saved_bwd)


def _init_bn(c: int) -> Tuple[Params, Params]:
    params = {"scale": jnp.ones((c,)), "bias": jnp.zeros((c,))}
    state = {"mean": jnp.zeros((c,)), "var": jnp.ones((c,))}
    return params, state


def _bn(p: Params, s: Params, x: jnp.ndarray, train: bool):
    if train:
        mean = jnp.mean(x, axis=(0, 1, 2))
        var = jnp.var(x, axis=(0, 1, 2))
        n = x.shape[0] * x.shape[1] * x.shape[2]
        unbiased = var * n / max(n - 1, 1)
        new_s = {
            "mean": (1 - BN_MOMENTUM) * s["mean"] + BN_MOMENTUM * mean,
            "var": (1 - BN_MOMENTUM) * s["var"] + BN_MOMENTUM * unbiased,
        }
    else:
        mean, var = s["mean"], s["var"]
        new_s = s
    y = (x - mean) * jax.lax.rsqrt(var + BN_EPS) * p["scale"] + p["bias"]
    return y, new_s


# ---------------------------------------------------------------------------

def init_frontend(key, feat_extractor: str) -> Tuple[Optional[Params], Optional[Params]]:
    """Returns (params, state); (None, None) when no frontend."""
    if feat_extractor == "vgg_cnn":
        ks = jax.random.split(key, 4)
        params = {
            "conv1": _init_conv(ks[0], 3, 3, 1, 64),
            "conv2": _init_conv(ks[1], 3, 3, 64, 64),
            "conv3": _init_conv(ks[2], 3, 3, 64, 128),
            "conv4": _init_conv(ks[3], 3, 3, 128, 128),
        }
        return params, {}
    if feat_extractor == "emb_cnn":
        ks = jax.random.split(key, 2)
        bn1_p, bn1_s = _init_bn(32)
        bn2_p, bn2_s = _init_bn(32)
        params = {
            "conv1": _init_conv(ks[0], 41, 11, 1, 32),
            "bn1": bn1_p,
            "conv2": _init_conv(ks[1], 21, 11, 32, 32),
            "bn2": bn2_p,
        }
        return params, {"bn1": bn1_s, "bn2": bn2_s}
    return None, None


def apply_frontend(params: Optional[Params], state: Optional[Params],
                   spect: jnp.ndarray, feat_extractor: str,
                   train: bool = False, dtype=jnp.bfloat16):
    """spect: (B, F, T) log-spectrogram. Returns ((B, T', H), new_state).

    H and T' follow the reference arithmetic (utils/functions.py:116-133):
    vgg_cnn → (F//4)*128 @ T//4; emb_cnn → 672 @ roughly T/2.
    """
    if feat_extractor not in ("vgg_cnn", "emb_cnn"):
        # no frontend: (B, F, T) -> (B, T, F)  (transformer.py:74-76)
        return jnp.transpose(spect, (0, 2, 1)), state

    x = spect[..., None]  # (B, F, T, 1)
    if feat_extractor == "vgg_cnn":
        # pool2(relu(conv + b)) ≡ relu(pool2(conv) + b): max commutes
        # with the monotone bias-add/relu, so the bias and relu that
        # precede each pool run on the 4×-smaller pooled tensor instead
        # of at full resolution (the full-res elementwise passes ran at
        # ~15% of HBM bandwidth on v5e — the 64-channel minor dim wastes
        # half the vector lanes). Numerically identical to the reference
        # ordering (transformer.py:36-44); measured 460 → 512 utt/s/chip.
        # Fused Pallas path (ops/vgg_fused.py): conv1+relu+conv2+pool and
        # conv3+relu+conv4+pool each run as one kernel whose custom VJP
        # emits weight grads (and, for block2, the input grad) — nothing
        # full-resolution round-trips HBM. Compiled backends only — the
        # interpreter would be ~100x slower than the composite on CPU
        # (the kernels are pinned against this composite by
        # tests/test_vgg_fused.py).
        fused1 = _use_fused_block1(spect)
        F2, T2 = spect.shape[1] // 2, spect.shape[2] // 2
        fused2 = (fused1 and _BLOCK2_ENABLED
                  and _block2_shapes_ok(F2, T2))
        # The fused kernels' VJPs emit NO input gradient (see
        # _zero_input_cotangent in ops/vgg_fused.py): the featurizer
        # upstream has no trainable parameters. stop_gradient makes that
        # contract explicit here — a future trainable featurizer must
        # add an input-grad pass to the kernel, not just drop this.
        if fused1:
            spect = jax.lax.stop_gradient(spect)
        if fused2:
            x_t = vgg_block1_t(spect, params["conv1"]["w"],
                               params["conv1"]["b"], params["conv2"]["w"],
                               params["conv2"]["b"], dtype)
            y_t = vgg_block2(x_t, params["conv3"]["w"],
                             params["conv3"]["b"], params["conv4"]["w"],
                             params["conv4"]["b"], dtype)
            # (B, F', C, T') -> (B, T', C*F') with feature = c*F' + f
            B, Fp, C_, Tp = y_t.shape
            x = jnp.transpose(y_t, (0, 3, 2, 1)).reshape(B, Tp, C_ * Fp)
            return x.astype(jnp.float32), state
        # Measured dead-end (tools/probe_nhcw.py): feeding conv3 the
        # block1 kernel's native (B,F',C,T') output via lhs_spec "NHCW"
        # (skipping the logical transpose) is numerically exact but a
        # perf wash — XLA canonicalizes custom dimension numbers back to
        # the same relayout copies (standalone fwd+bwd 11.48 vs 11.44 ms,
        # in-step within drift noise, grad HLO byte-identical).
        if fused1:
            x = vgg_block1(spect, params["conv1"]["w"],
                           params["conv1"]["b"], params["conv2"]["w"],
                           params["conv2"]["b"], dtype)
        else:
            x = jax.nn.relu(_conv(params["conv1"], x, (1, 1), "SAME",
                                  dtype))
            x = _conv_pool_relu(params["conv2"], x, dtype)
        if BLOCK2_SAVED_VJP:
            # (_pool2_idx crops odd tails exactly like the VALID pool)
            x = _block2_saved(x, params["conv3"]["w"],
                              params["conv3"]["b"], params["conv4"]["w"],
                              params["conv4"]["b"], dtype)
        else:
            x = jax.nn.relu(_conv(params["conv3"], x, (1, 1), "SAME",
                                  dtype))
            x = _conv_pool_relu(params["conv4"], x, dtype)
        new_state = state
    else:  # emb_cnn
        # Conv2d(1→32, (41,11), stride (2,2), padding (0,10)) — torch pads
        # height by 0 and width by 10 on both sides.
        x = _conv(params["conv1"], x, (2, 2), [(0, 0), (10, 10)], dtype)
        x, s1 = _bn(params["bn1"], state["bn1"], x, train)
        x = jnp.clip(x, 0.0, 20.0)  # Hardtanh(0, 20)
        x = _conv(params["conv2"], x, (2, 1), [(0, 0), (0, 0)], dtype)
        x, s2 = _bn(params["bn2"], state["bn2"], x, train)
        x = jnp.clip(x, 0.0, 20.0)
        new_state = {"bn1": s1, "bn2": s2}

    # (B, F', T', C) -> (B, T', C*F') with feature index = c*F' + f,
    # matching view(B, C*F', T').transpose(1, 2) in transformer.py:74-76.
    B, Fp, Tp, C = x.shape
    x = jnp.transpose(x, (0, 2, 3, 1)).reshape(B, Tp, C * Fp)
    return x.astype(jnp.float32), new_state


def frontend_time_reduction(feat_extractor: str) -> int:
    """Static time-axis subsampling factor (vgg: 4; emb: ~2; none: 1)."""
    if feat_extractor == "vgg_cnn":
        return 4
    if feat_extractor == "emb_cnn":
        return 2
    return 1


def frontend_out_time(feat_extractor: str, T: int) -> int:
    """Exact post-frontend time length for input length T."""
    if feat_extractor == "vgg_cnn":
        return T // 2 // 2
    if feat_extractor == "emb_cnn":
        t1 = (T + 20 - 11) // 2 + 1
        return t1 - 11 + 1
    return T
