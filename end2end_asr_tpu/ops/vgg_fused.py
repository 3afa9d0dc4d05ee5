"""Fused Pallas kernel for the first vgg frontend block:

    relu(maxpool2x2(conv2_SAME(relu(conv1_SAME(spect) + b1))) + b2)

mirroring /root/reference/models/asr/transformer.py:36-44 (conv1/conv2 +
first MaxPool2d of the vgg extractor). On v5e this region — two
full-resolution (B,161,800,64) convs, the pool, their input/weight grads
and the pool's select_and_scatter — is ~14 ms of a 27 ms train step at
18-28% MFU, because the 64-channel minor dim half-fills the MXU lanes
and every op round-trips 198 MB through HBM.

Design (nothing full-resolution ever touches HBM, in either direction):

- Transposed compute layout: channels in sublanes, time in lanes.
- Polyphase-in-time: all tensors are carried as (even-t, odd-t) pairs,
  so the 2x2 pool is an elementwise max of four registers and the
  lane deinterleave Mosaic cannot express never happens.
- conv2 is an im2col matmul y = W2p (64,576) @ A (576,Tp) per conv row
  and phase. A is a ZERO-COPY contiguous sublane slice of an
  interleaved scratch buffer: conv1 outputs are written as row-blocks
  [tap0; tap1; tap2] where the taps are the phase-appropriate
  lane-rolled copies, so three consecutive row-blocks ARE the im2col
  matrix. Measured on v5e: fwd (64,576)@(576,400) 144 TF/s, input-grad
  (576,64)@(64,400) 141 TF/s, weight-grad (64,400)x(576,400)^T 131
  TF/s — vs 35-55 TF/s for XLA's equivalent convolutions.
- The custom VJP consumes the pooled gradient (49 MB) and emits ONLY
  dW1, db1, dW2, db2: conv1 activations are rebuilt in-kernel (1.6% of
  the block's FLOPs) and weight grads accumulate in f32 across the
  sequential grid.
- Pool tie-breaking is first-in-window-order, identical to torch
  MaxPool2d / XLA select_and_scatter; conv outputs are rounded to the
  compute dtype before pooling and the bias-add/relu run in the compute
  dtype, so forward and argmax match the unfused XLA path.

Mosaic constraints honored: lane rotates only on 32-bit data (rolls run
on f32 pre-cast values), no (T,C)<->(T/2,2C) shape casts, no boolean
select_n, sublane slice offsets kept 8/16-aligned (the conv1 im2col
buffer pads each window row-triple to an 8-row block and stays f32).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

C = 64  # block1 channel count (conv1 out == conv2 in/out)


def _pick_chunk(Fp: int, target: int):
    """Chunk of pooled rows per grid cell. Mosaic requires block sublane
    dims divisible by 8, so the 2*CH-row spectrogram blocks need CH % 4
    == 0; returns None when no such chunk divides Fp (caller falls back
    to the unfused path)."""
    for c in range(min(target, Fp), 3, -1):
        if Fp % c == 0 and c % 4 == 0:
            return c
    return None


def supported(F: int, T: int) -> bool:
    """True when the fused kernel can handle this (F, T)."""
    return (T % 2 == 0 and F >= 8
            and _pick_chunk(F // 2, 8) is not None)


def _roll_p1(x, Th):
    """x[t-1] at lane t, zero at t=0 (x must be 32-bit)."""
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    return jnp.where(lane == 0, 0.0, pltpu.roll(x, 1, axis=1))


def _roll_m1(x, Th):
    """x[t+1] at lane t, zero at t=Th-1 (x must be 32-bit)."""
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    return jnp.where(lane == Th - 1, 0.0, pltpu.roll(x, Th - 1, axis=1))


def _spect_row(refs, k, CH, G0, F, nc, Th):
    """Window row k (global G0+k-2) from the chunk blocks, OOB-zeroed.

    refs = (prev, main, next, tail): prev/next are the +-1 chunk blocks
    (index-clamped at the grid edges); tail is the fixed final 2-row
    block that holds the last spectrogram row when F is odd (the chunked
    blocks only cover rows [0, 2*Fp))."""
    c = pl.program_id(1)
    if k < 2:
        row = refs[0][0, 2 * CH - 2 + k:2 * CH - 1 + k, :]
    elif k < 2 + 2 * CH:
        row = refs[1][0, k - 2:k - 1, :]
    else:
        loc = k - 2 - 2 * CH
        row_n = refs[2][0, loc:loc + 1, :]
        # the tail block starts at row 8*((F-1)//8); only loc == 0
        # (global row 2*(F//2), i.e. F-1 when F is odd) is ever valid —
        # the loc == 1 lane is OOB-zeroed below, so clamping is safe.
        tloc = min((F - 1) % 8 + loc, 7)
        row_t = refs[3][0, tloc:tloc + 1, :]
        row = jnp.where(c == nc - 1, row_t, row_n)
    row = row.astype(jnp.float32)
    g = G0 + k - 2
    return jnp.where((g >= 0) & (g < F), row, 0.0)


def _build_sp(se_refs, so_refs, spe, spo, CH, G0, F, nc, Th):
    """SP buffers: one 8-row block per spect window row k holding the
    three dt-taps (padded to 8 for aligned slicing), f32 so the lane
    rolls are legal. conv1's im2col for x1 row r is SP[8r : 8r+24].
    Taps: phase e -> [so(+1), se, so]; phase o -> [se, so, se(-1)].
    Tap values equal the compute-dtype-rounded spectrogram, so the f32
    matmul reproduces the unfused bf16 convolution exactly."""
    S = 2 * CH + 4
    pad = jnp.zeros((5, Th), jnp.float32)
    for k in range(S):
        se_r = _spect_row(se_refs, k, CH, G0, F, nc, Th)
        so_r = _spect_row(so_refs, k, CH, G0, F, nc, Th)
        spe[8 * k:8 * k + 8, :] = jnp.concatenate(
            [_roll_p1(so_r, Th), se_r, so_r, pad], axis=0)
        spo[8 * k:8 * k + 8, :] = jnp.concatenate(
            [se_r, so_r, _roll_m1(se_r, Th), pad], axis=0)


def _build_x1(spe, spo, xie, xio, w1_ref, b1_ref, CH, G0, F, Th, cdt):
    """conv1+bias+relu for the chunk's x1 rows, written as interleaved
    tap row-blocks so conv2's im2col A for conv row m is the contiguous
    slice XI[192m : 192m+576].
    Tap order matches _build_sp: XIe -> [x1o(+1), x1e, x1o],
    XIo -> [x1e, x1o, x1e(-1)]."""
    R = 2 * CH + 2
    b1 = b1_ref[:].astype(jnp.float32)
    for r in range(R):
        xg = G0 + r - 1
        valid = (xg >= 0) & (xg < F)
        x1e = jnp.dot(w1_ref[:], spe[8 * r:8 * r + 24, :],
                      preferred_element_type=jnp.float32)
        x1o = jnp.dot(w1_ref[:], spo[8 * r:8 * r + 24, :],
                      preferred_element_type=jnp.float32)
        # round exactly like the unfused path: bf16 conv output, then
        # relu (relu and the cast commute)
        x1e = jnp.where(valid, jax.nn.relu(x1e + b1), 0.0).astype(cdt)
        x1o = jnp.where(valid, jax.nn.relu(x1o + b1), 0.0).astype(cdt)
        x1e32, x1o32 = x1e.astype(jnp.float32), x1o.astype(jnp.float32)
        o = 3 * C * r
        xie[o:o + C, :] = _roll_p1(x1o32, Th).astype(cdt)
        xie[o + C:o + 2 * C, :] = x1e
        xie[o + 2 * C:o + 3 * C, :] = x1o
        xio[o:o + C, :] = x1e
        xio[o + C:o + 2 * C, :] = x1o
        xio[o + 2 * C:o + 3 * C, :] = _roll_m1(x1e32, Th).astype(cdt)


def _fwd_kernel(se_m, se_0, se_p, se_t, so_m, so_0, so_p, so_t,
                w1_ref, b1_ref, w2_ref, b2_ref, out_ref, idx_ref,
                spe, spo, xie, xio, *, CH, F, nc, Th, cdt):
    G0 = 2 * CH * pl.program_id(1)
    _build_sp((se_m, se_0, se_p, se_t), (so_m, so_0, so_p, so_t),
              spe, spo, CH, G0, F, nc, Th)
    _build_x1(spe, spo, xie, xio, w1_ref, b1_ref, CH, G0, F, Th, cdt)
    b2 = b2_ref[:].astype(cdt)
    for j in range(CH):
        vs = []
        for q in (0, 1):
            m = 2 * j + q
            for xi in (xie, xio):
                y = jnp.dot(w2_ref[:], xi[3 * C * m:3 * C * (m + 3), :],
                            preferred_element_type=jnp.float32)
                # round to cdt BEFORE pooling: the unfused path pools
                # the conv's cdt output; argmax (=> backward) must match
                vs.append(y.astype(cdt).astype(jnp.float32))
        best = vs[0]
        idx = jnp.zeros(best.shape, jnp.int32)
        for i in (1, 2, 3):
            take = vs[i] > best  # strict: earlier window elem wins ties
            best = jnp.where(take, vs[i], best)
            idx = jnp.where(take, i, idx)
        # bias-add rounds in cdt exactly like the unfused path; relu runs
        # in f32 (identical values — Mosaic has no bf16 compare)
        pooled = jax.nn.relu((best.astype(cdt) + b2).astype(jnp.float32))
        out_ref[0, j] = pooled.astype(out_ref.dtype)
        idx_ref[0, j] = idx.astype(jnp.uint8)


def _bwd_kernel(se_m, se_0, se_p, se_t, so_m, so_0, so_p, so_t,
                w1_ref, b1_ref, w2_ref, w2t_ref, g_ref, out_in_ref,
                idx_ref, dw1_ref, db1_ref, dw2_ref, db2_ref,
                spe, spo, xie, xio, dxe, dxo, *, CH, F, nc, Th, cdt):
    b = pl.program_id(0)
    c = pl.program_id(1)
    G0 = 2 * CH * c

    @pl.when((b == 0) & (c == 0))
    def _():
        dw1_ref[:] = jnp.zeros_like(dw1_ref)
        db1_ref[:] = jnp.zeros_like(db1_ref)
        dw2_ref[:] = jnp.zeros_like(dw2_ref)
        db2_ref[:] = jnp.zeros_like(db2_ref)

    # forward replay: conv1 activations (1.6% of the block's FLOPs)
    _build_sp((se_m, se_0, se_p, se_t), (so_m, so_0, so_p, so_t),
              spe, spo, CH, G0, F, nc, Th)
    _build_x1(spe, spo, xie, xio, w1_ref, b1_ref, CH, G0, F, Th, cdt)

    dxe[:] = jnp.zeros_like(dxe)
    dxo[:] = jnp.zeros_like(dxo)
    dw2_acc = jnp.zeros((C, 9 * C), jnp.float32)
    db2_acc = jnp.zeros((C, 1), jnp.float32)
    for j in range(CH):
        out_v = out_in_ref[0, j].astype(jnp.float32)
        g = jnp.where(out_v > 0, g_ref[0, j].astype(jnp.float32), 0.0)
        db2_acc += jnp.sum(g, axis=1, keepdims=True)
        idx = idx_ref[0, j].astype(jnp.int32)
        for q in (0, 1):
            m = 2 * j + q
            for p, xi in enumerate((xie, xio)):
                widx = 2 * q + p
                dy = jnp.where(idx == widx, g, 0.0).astype(cdt)
                A = xi[3 * C * m:3 * C * (m + 3), :]
                dw2_acc += jax.lax.dot_general(
                    dy, A, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)
                dA = jnp.dot(w2t_ref[:], dy,
                             preferred_element_type=jnp.float32)
                for df in range(3):
                    ro = C * (m + df)
                    o = 3 * C * df
                    v0 = dA[o:o + C, :]
                    v1 = dA[o + C:o + 2 * C, :]
                    v2 = dA[o + 2 * C:o + 3 * C, :]
                    if p == 0:   # taps [x1o(+1), x1e, x1o]
                        dxo[ro:ro + C, :] += _roll_m1(v0, Th) + v2
                        dxe[ro:ro + C, :] += v1
                    else:        # taps [x1e, x1o, x1e(-1)]
                        dxe[ro:ro + C, :] += v0 + _roll_p1(v2, Th)
                        dxo[ro:ro + C, :] += v1
    dw2_ref[:] += dw2_acc
    db2_ref[:] += db2_acc

    dw1_acc = jnp.zeros((C, 24), jnp.float32)
    db1_acc = jnp.zeros((C, 1), jnp.float32)
    for r in range(2 * CH + 2):
        o = 3 * C * r
        x1e = xie[o + C:o + 2 * C, :].astype(jnp.float32)  # relu(conv1), e
        x1o = xie[o + 2 * C:o + 3 * C, :].astype(jnp.float32)
        dxe_r = jnp.where(x1e > 0, dxe[C * r:C * (r + 1), :], 0.0)
        dxo_r = jnp.where(x1o > 0, dxo[C * r:C * (r + 1), :], 0.0)
        db1_acc += (jnp.sum(dxe_r, axis=1, keepdims=True)
                    + jnp.sum(dxo_r, axis=1, keepdims=True))
        dw1_acc += jax.lax.dot_general(
            dxe_r.astype(cdt).astype(jnp.float32), spe[8 * r:8 * r + 24, :],
            (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
        dw1_acc += jax.lax.dot_general(
            dxo_r.astype(cdt).astype(jnp.float32), spo[8 * r:8 * r + 24, :],
            (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
    dw1_ref[:] += dw1_acc
    db1_ref[:] += db1_acc


def _specs(CH, F, Th, cdt, nc):
    def chunk_spec(off):
        def imap(b, c):
            cc = jnp.maximum(jnp.minimum(c + off, nc - 1), 0)
            return (b, cc, 0)
        return pl.BlockSpec((1, 2 * CH, Th), imap, memory_space=pltpu.VMEM)

    tail_spec = pl.BlockSpec((1, 8, Th), lambda b, c: (b, (F - 1) // 8, 0),
                             memory_space=pltpu.VMEM)
    spect_specs = [chunk_spec(-1), chunk_spec(0), chunk_spec(1), tail_spec]
    w_specs = [
        pl.BlockSpec((C, 24), lambda b, c: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((C, 1), lambda b, c: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((C, 9 * C), lambda b, c: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((C, 1), lambda b, c: (0, 0), memory_space=pltpu.VMEM),
    ]
    scratch = [
        pltpu.VMEM((8 * (2 * CH + 4), Th), jnp.float32),    # SPe
        pltpu.VMEM((8 * (2 * CH + 4), Th), jnp.float32),    # SPo
        pltpu.VMEM((3 * C * (2 * CH + 2), Th), cdt),        # XIe
        pltpu.VMEM((3 * C * (2 * CH + 2), Th), cdt),        # XIo
    ]
    return spect_specs, w_specs, scratch


def _pack(w1, b1, w2, b2, cdt):
    # w1p columns: 8*df + dt (padded to 24 for aligned SP slices)
    w1p = jnp.zeros((C, 24), jnp.float32)
    cols = jnp.transpose(w1[:, :, 0, :], (2, 0, 1)).astype(cdt).astype(
        jnp.float32)  # (C, 3, 3) rounded to cdt
    w1p = w1p.at[:, 0:3].set(cols[:, 0])
    w1p = w1p.at[:, 8:11].set(cols[:, 1])
    w1p = w1p.at[:, 16:19].set(cols[:, 2])
    w2p = jnp.transpose(w2, (3, 0, 1, 2)).reshape(C, 9 * C).astype(cdt)
    return (w1p, b1.reshape(C, 1).astype(jnp.float32),
            w2p, b2.reshape(C, 1).astype(cdt))


def _fwd_pallas(se, so, w1p, b1c, w2p, b2c, *, F, CH, cdt, interpret):
    B, _, Th = se.shape
    Fp = F // 2
    nc = Fp // CH
    spect_specs, w_specs, scratch = _specs(CH, F, Th, cdt, nc)
    out, idx = pl.pallas_call(
        functools.partial(_fwd_kernel, CH=CH, F=F, nc=nc, Th=Th, cdt=cdt),
        grid=(B, nc),
        in_specs=spect_specs + spect_specs + w_specs,
        out_specs=[
            pl.BlockSpec((1, CH, C, Th), lambda b, c: (b, c, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, CH, C, Th), lambda b, c: (b, c, 0, 0),
                         memory_space=pltpu.VMEM)],
        out_shape=[
            jax.ShapeDtypeStruct((B, Fp, C, Th), cdt),
            jax.ShapeDtypeStruct((B, Fp, C, Th), jnp.uint8)],
        scratch_shapes=scratch,
        interpret=interpret,
    )(se, se, se, se, so, so, so, so, w1p, b1c, w2p, b2c)
    return out, idx


def _bwd_pallas(se, so, w1p, b1c, w2p, b2c, out, idx, g,
                *, F, CH, cdt, interpret):
    B, _, Th = se.shape
    Fp = F // 2
    nc = Fp // CH
    spect_specs, w_specs, scratch = _specs(CH, F, Th, cdt, nc)
    R = 2 * CH + 2
    scratch = scratch + [
        pltpu.VMEM((C * R, Th), jnp.float32),   # dxe
        pltpu.VMEM((C * R, Th), jnp.float32),   # dxo
    ]
    big_spec = pl.BlockSpec((1, CH, C, Th), lambda b, c: (b, c, 0, 0),
                            memory_space=pltpu.VMEM)
    acc = lambda cols: pl.BlockSpec((C, cols), lambda b, c: (0, 0),
                                    memory_space=pltpu.VMEM)
    w2t_spec = pl.BlockSpec((9 * C, C), lambda b, c: (0, 0),
                            memory_space=pltpu.VMEM)
    dw1, db1, dw2, db2 = pl.pallas_call(
        functools.partial(_bwd_kernel, CH=CH, F=F, nc=nc, Th=Th, cdt=cdt),
        grid=(B, nc),
        in_specs=(spect_specs + spect_specs
                  + [w_specs[0], w_specs[1], w_specs[2], w2t_spec]
                  + [big_spec, big_spec, big_spec]),
        out_specs=[acc(24), acc(1), acc(9 * C), acc(1)],
        out_shape=[jax.ShapeDtypeStruct((C, 24), jnp.float32),
                   jax.ShapeDtypeStruct((C, 1), jnp.float32),
                   jax.ShapeDtypeStruct((C, 9 * C), jnp.float32),
                   jax.ShapeDtypeStruct((C, 1), jnp.float32)],
        scratch_shapes=scratch,
        interpret=interpret,
    )(se, se, se, se, so, so, so, so, w1p, b1c, w2p, w2p.T, g, out, idx)
    return dw1, db1, dw2, db2


def _split_phases(spect, cdt):
    # rounded to cdt once here: every kernel tap sees cdt-valued input,
    # matching the unfused path's x.astype(bf16) before conv1
    s = spect.astype(cdt).astype(jnp.float32)
    return s[:, :, 0::2], s[:, :, 1::2]


def _block1_fwd(spect, w1, b1, w2, b2, cdt):
    B, F, T = spect.shape
    Fp = F // 2
    CH = _pick_chunk(Fp, 8)
    se, so = _split_phases(spect, cdt)
    w1p, b1c, w2p, b2c = _pack(w1, b1, w2, b2, cdt)
    interpret = jax.default_backend() == "cpu"
    out_t, idx = _fwd_pallas(se, so, w1p, b1c, w2p, b2c,
                             F=F, CH=CH, cdt=cdt, interpret=interpret)
    return jnp.transpose(out_t, (0, 1, 3, 2)), (out_t, idx)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def vgg_block1(spect, w1, b1, w2, b2, cdt=jnp.bfloat16):
    """Fused conv1+relu+conv2+pool+bias+relu. spect (B, F, T) float;
    w1 (3,3,1,64), w2 (3,3,64,64), b1/b2 (64,).
    Returns (B, F//2, T//2, 64) NHWC in cdt."""
    out, _ = _block1_fwd(spect, w1, b1, w2, b2, cdt)
    return out


def _vjp_fwd(spect, w1, b1, w2, b2, cdt):
    out, (out_t, idx) = _block1_fwd(spect, w1, b1, w2, b2, cdt)
    return out, (spect, w1, b1, w2, b2, out_t, idx)


def _vjp_bwd(cdt, res, g):
    spect, w1, b1, w2, b2, out_t, idx = res
    B, F, T = spect.shape
    Fp = F // 2
    CH = _pick_chunk(Fp, 4)
    se, so = _split_phases(spect, cdt)
    w1p, b1c, w2p, b2c = _pack(w1, b1, w2, b2, cdt)
    g_t = jnp.transpose(g, (0, 1, 3, 2)).astype(cdt)
    interpret = jax.default_backend() == "cpu"
    dw1p, db1, dw2p, db2 = _bwd_pallas(
        se, so, w1p, b1c, w2p, b2c, out_t, idx, g_t,
        F=F, CH=CH, cdt=cdt, interpret=interpret)
    # unpack: w1p columns were 8*df + dt
    dw1 = jnp.stack([dw1p[:, 0:3], dw1p[:, 8:11], dw1p[:, 16:19]],
                    axis=1)                      # (C, 3df, 3dt)
    dw1 = jnp.transpose(dw1, (1, 2, 0))[:, :, None, :].astype(w1.dtype)
    dw2 = jnp.transpose(dw2p.reshape(C, 3, 3, C),
                        (1, 2, 3, 0)).astype(w2.dtype)
    return (jnp.zeros_like(spect), dw1, db1.reshape(-1).astype(b1.dtype),
            dw2, db2.reshape(-1).astype(b2.dtype))


vgg_block1.defvjp(_vjp_fwd, _vjp_bwd)
