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


def _vmem_bytes_per_lane(CH: int) -> int:
    """Per-Th-lane VMEM demand of the BACKWARD grid cell (the larger of
    the two): pipelined spect chunk blocks (×2 for double buffering),
    the g/out/idx big blocks, and the SP/XI/dx scratch — every buffer's
    last dim is Th, so total VMEM scales linearly in T."""
    blocks = (6 * 2 * CH * 4 + 2 * 8 * 4) * 2       # se/so chunks + tails
    big = CH * C * (2 + 2 + 1) * 2                  # g, out (bf16), idx (u8)
    sp = 2 * 8 * (2 * CH + 4) * 4                   # SPe/SPo f32
    xi = 2 * 3 * C * (2 * CH + 2) * 2               # XIe/XIo cdt
    dx = 2 * C * (2 * CH + 2) * 4                   # dxe/dxo f32
    return blocks + big + sp + xi + dx


def supported(F: int, T: int) -> bool:
    """True when the fused kernel can handle this (F, T). Long buckets
    (the src ladder reaches 4000 frames) are excluded: scratch/block
    VMEM grows ~30 KB per Th=T/2 lane at CH=8, so T beyond ~850 would
    overflow the ~16 MB VMEM and fail Mosaic compilation — those bucket
    programs take the composite XLA path instead (models/frontend.py).
    T=800 (the AiShell README hot bucket) is measured-good on v5e."""
    if not (T % 2 == 0 and F >= 8):
        return False
    CH = _pick_chunk(F // 2, 8)
    if CH is None:
        return False
    return (T // 2) * _vmem_bytes_per_lane(CH) <= 13 * 1024 * 1024


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
        # KNOWN 1-ulp divergence from the composite path: this adds the
        # bias in f32 on the unrounded conv output, where frontend._conv
        # computes bf16(conv) + bf16(bias) in bf16. When the two
        # roundings straddle a bf16 boundary, x1 differs by 1 ulp and a
        # pool-argmax tie can route the gradient differently. Within the
        # parity tests' bf16 tolerance; fixing it changes kernel
        # numerics, which invalidates the saved real-TPU golden — redo
        # capture_vgg_golden on hardware if this line is ever aligned.
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
                w1_ref, b1_ref, w2t_ref, g_ref, out_in_ref,
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
        # w2 itself is NOT an operand — the kernel only reads w2.T
        # (dA via w2t_ref) and computes dw2 from dy @ A, so shipping the
        # 72 KB w2 block would waste VMEM in the budget-gated backward
        in_specs=(spect_specs + spect_specs
                  + [w_specs[0], w_specs[1], w2t_spec]
                  + [big_spec, big_spec, big_spec]),
        out_specs=[acc(24), acc(1), acc(9 * C), acc(1)],
        out_shape=[jax.ShapeDtypeStruct((C, 24), jnp.float32),
                   jax.ShapeDtypeStruct((C, 1), jnp.float32),
                   jax.ShapeDtypeStruct((C, 9 * C), jnp.float32),
                   jax.ShapeDtypeStruct((C, 1), jnp.float32)],
        scratch_shapes=scratch,
        interpret=interpret,
    )(se, se, se, se, so, so, so, so, w1p, b1c, w2p.T, g, out, idx)
    return dw1, db1, dw2, db2


def _split_phases(spect, cdt):
    # rounded to cdt once here: every kernel tap sees cdt-valued input,
    # matching the unfused path's x.astype(bf16) before conv1
    s = spect.astype(cdt).astype(jnp.float32)
    return s[:, :, 0::2], s[:, :, 1::2]


# ---------------------------------------------------------------------------
# SPMD batch partitioning: under a sharded jit the custom calls would be
# replicated (XLA cannot see through tpu_custom_call); the batch dim is
# embarrassingly parallel, and the backward's weight grads are per-shard
# partial sums combined with a psum (ops/partition.py).
# ---------------------------------------------------------------------------
from end2end_asr_tpu.ops.partition import batch_partitioned  # noqa: E402


def _fwd_impl_pos(se, so, w1p, b1c, w2p, b2c, F, CH, cdt, interpret):
    return _fwd_pallas(se, so, w1p, b1c, w2p, b2c, F=F, CH=CH, cdt=cdt,
                       interpret=interpret)


def _bwd_impl_pos(se, so, w1p, b1c, w2p, b2c, out, idx, g,
                  F, CH, cdt, interpret):
    return _bwd_pallas(se, so, w1p, b1c, w2p, b2c, out, idx, g,
                       F=F, CH=CH, cdt=cdt, interpret=interpret)


_fwd_partitioned = batch_partitioned(
    _fwd_impl_pos, batch_args=(0, 1), n_out=2,
    static_argnums=(6, 7, 8, 9),
    sharding_rule="b f t, b f t, c k, c u, c v, c w "
                  "-> b g c t, b g c t")

_bwd_partitioned = batch_partitioned(
    _bwd_impl_pos, batch_args=(0, 1, 6, 7, 8), n_out=4,
    reduced_out=(0, 1, 2, 3),
    static_argnums=(9, 10, 11, 12),
    sharding_rule="b f t, b f t, c k, c u, c v, c w, b g c t, b g c t, "
                  "b g c t -> c k, c u, c v, c w")


def _block1_fwd(spect, w1, b1, w2, b2, cdt):
    B, F, T = spect.shape
    Fp = F // 2
    CH = _pick_chunk(Fp, 8)
    se, so = _split_phases(spect, cdt)
    w1p, b1c, w2p, b2c = _pack(w1, b1, w2, b2, cdt)
    interpret = jax.default_backend() == "cpu"
    out_t, idx = _fwd_partitioned(se, so, w1p, b1c, w2p, b2c,
                                  F, CH, cdt, interpret)
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


def _zero_input_cotangent(spect):
    """The block1 kernels deliberately emit NO input gradient.

    The featurizer upstream of `spect` (STFT magnitude) has no trainable
    parameters, so the input cotangent is dead in every training program
    this framework builds, and skipping it is what keeps anything
    full-resolution from touching HBM in the backward pass. Call sites
    in models/frontend.py wrap `spect` in lax.stop_gradient so the
    contract is visible there too: if you ever make the featurizer
    trainable (saliency, adversarial perturbations, learned frontend),
    you must add an input-grad pass to this kernel — do not just remove
    the stop_gradient, or you will silently train on zeros.
    """
    return jnp.zeros_like(spect)


def _vjp_bwd(cdt, res, g):
    spect, w1, b1, w2, b2, out_t, idx = res
    B, F, T = spect.shape
    Fp = F // 2
    CH = _pick_chunk(Fp, 4)
    se, so = _split_phases(spect, cdt)
    w1p, b1c, w2p, b2c = _pack(w1, b1, w2, b2, cdt)
    g_t = jnp.transpose(g, (0, 1, 3, 2)).astype(cdt)
    interpret = jax.default_backend() == "cpu"
    dw1p, db1, dw2p, db2 = _bwd_partitioned(
        se, so, w1p, b1c, w2p, b2c, out_t, idx, g_t,
        F, CH, cdt, interpret)
    # unpack: w1p columns were 8*df + dt
    dw1 = jnp.stack([dw1p[:, 0:3], dw1p[:, 8:11], dw1p[:, 16:19]],
                    axis=1)                      # (C, 3df, 3dt)
    dw1 = jnp.transpose(dw1, (1, 2, 0))[:, :, None, :].astype(w1.dtype)
    dw2 = jnp.transpose(dw2p.reshape(C, 3, 3, C),
                        (1, 2, 3, 0)).astype(w2.dtype)
    return (_zero_input_cotangent(spect), dw1,
            db1.reshape(-1).astype(b1.dtype),
            dw2, db2.reshape(-1).astype(b2.dtype))


vgg_block1.defvjp(_vjp_fwd, _vjp_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def vgg_block1_t(spect, w1, b1, w2, b2, cdt=jnp.bfloat16):
    """vgg_block1 in the kernel-native transposed layout
    (B, F//2, 64, T//2) — used when the fused block2 consumes it, so the
    inter-block boundary is two lane slices instead of two transposes."""
    out_t, _ = _fwd_t(spect, w1, b1, w2, b2, cdt)
    return out_t


def _fwd_t(spect, w1, b1, w2, b2, cdt):
    B, F, T = spect.shape
    CH = _pick_chunk(F // 2, 8)
    se, so = _split_phases(spect, cdt)
    w1p, b1c, w2p, b2c = _pack(w1, b1, w2, b2, cdt)
    return _fwd_partitioned(se, so, w1p, b1c, w2p, b2c, F, CH, cdt,
                            jax.default_backend() == "cpu")


def _vjp_fwd_t(spect, w1, b1, w2, b2, cdt):
    out_t, idx = _fwd_t(spect, w1, b1, w2, b2, cdt)
    return out_t, (spect, w1, b1, w2, b2, out_t, idx)


def _vjp_bwd_t(cdt, res, g_t):
    spect, w1, b1, w2, b2, out_t, idx = res
    B, F, T = spect.shape
    CH = _pick_chunk(F // 2, 4)
    se, so = _split_phases(spect, cdt)
    w1p, b1c, w2p, b2c = _pack(w1, b1, w2, b2, cdt)
    dw1p, db1, dw2p, db2 = _bwd_partitioned(
        se, so, w1p, b1c, w2p, b2c, out_t, idx, g_t.astype(cdt),
        F, CH, cdt, jax.default_backend() == "cpu")
    dw1 = jnp.stack([dw1p[:, 0:3], dw1p[:, 8:11], dw1p[:, 16:19]],
                    axis=1)
    dw1 = jnp.transpose(dw1, (1, 2, 0))[:, :, None, :].astype(w1.dtype)
    dw2 = jnp.transpose(dw2p.reshape(C, 3, 3, C),
                        (1, 2, 3, 0)).astype(w2.dtype)
    return (_zero_input_cotangent(spect), dw1,
            db1.reshape(-1).astype(b1.dtype),
            dw2, db2.reshape(-1).astype(b2.dtype))


vgg_block1_t.defvjp(_vjp_fwd_t, _vjp_bwd_t)


# ---------------------------------------------------------------------------
# Block 2: relu(maxpool2x2(conv4_SAME(relu(conv3_SAME(x) + b3))) + b4)
# (transformer.py:45-53 — conv3 64->128, conv4 128->128, second pool).
#
# Same machinery one level up, with two differences:
# - the input already has 64 channels, so the conv3 im2col comes from an
#   interleaved variant buffer of the INPUT rows (lane rolls via f32
#   round-trips);
# - the custom VJP must ALSO emit the input gradient (block1 consumes
#   it). Input-grad rows near chunk borders receive contributions from
#   NEIGHBORING chunks' pool windows, so the backward runs over an
#   extended halo (two extra pooled rows per cell: their dy's complete
#   the border x2 gradients) while dW/db accumulation is gated to each
#   cell's interior rows — every (pool-row -> x2-row -> weight) path is
#   counted exactly once globally, and every emitted input-grad row is
#   complete. F must be even (odd-F tails fall back to the composite).
# ---------------------------------------------------------------------------

CI2, C2 = 64, 128

# Measured on v5e (AiShell flagship step, same-session A/B): the fused
# block2 forward is a clear win (1.38 ms vs ~2.1 composite) but the
# backward stays at 5-6 ms against ~3.3 composite no matter the
# formulation — unrolled loops blow Mosaic's 16 MB scoped-vmem stack
# (zero slot reuse across iterations: 16 live 0.9 MB dA temps, 20.5 MB
# demand -> silent HBM spill), fori_loop + dynamic ref slices avoid the
# spill but run 25% slower than spilled-unrolled, and routing dA through
# a reused scratch ref still lands at 22.6 ms end-to-end vs 19.1 with
# the composite block2. Full step: block1+block2 fused 22.2-24.3 ms vs
# 19.1 block1-only. Until the backward has a fundamentally leaner
# schedule (two-pass with dy3 through HBM is the next candidate), the
# frontend keeps XLA's composite for block2.
# ALSO before re-enabling: the backward accumulates dx2/dxi in bf16
# scratch with ~12 sequential rounded `+=` per row (each partial sum
# re-rounds to 8 mantissa bits; contributions ~256x below the running
# sum vanish) — materially lossier than the composite's single
# post-accumulation rounding. Switch those scratch refs to f32 (VMEM
# budget permitting) as part of any re-enable.
BLOCK2_ENABLED = False


def _pick_chunk2(Fp: int, target: int):
    """Block2 chunks only need CH >= 2 (its blocks are 4D, so the F axis
    is an unconstrained leading dim) and CH | Fp."""
    for c in range(min(target, Fp), 1, -1):
        if Fp % c == 0:
            return c
    return None


def supported2(F: int, T: int) -> bool:
    return (T % 2 == 0 and F % 2 == 0 and F >= 4
            and _pick_chunk2(F // 2, 8) is not None)


def _in_row(refs, k, CH, halo, G0, F, nc):
    """Input window row k (global G0+k-halo) as (CI2, Th) f32, OOB-zeroed.
    refs = (prev, main, next) chunk blocks of (1, 2CH, CI2, Th)."""
    c = pl.program_id(1)
    if k < halo:
        row = refs[0][0, 2 * CH - halo + k]
    elif k < halo + 2 * CH:
        row = refs[1][0, k - halo]
    else:
        row = refs[2][0, k - halo - 2 * CH]
    g = G0 + k - halo
    return jnp.where((g >= 0) & (g < F), row.astype(jnp.float32), 0.0)


def _build_xiin(xe_refs, xo_refs, xiine, xiino, CH, halo, S, G0, F, nc,
                Th, cdt):
    """Interleaved conv3 im2col buffers from the input rows.
    Taps: phase e -> [xo(+1), xe, xo]; phase o -> [xe, xo, xe(-1)]."""
    for k in range(S):
        xe32 = _in_row(xe_refs, k, CH, halo, G0, F, nc)
        xo32 = _in_row(xo_refs, k, CH, halo, G0, F, nc)
        o = 3 * CI2 * k
        xiine[o:o + CI2, :] = _roll_p1(xo32, Th).astype(cdt)
        xiine[o + CI2:o + 2 * CI2, :] = xe32.astype(cdt)
        xiine[o + 2 * CI2:o + 3 * CI2, :] = xo32.astype(cdt)
        xiino[o:o + CI2, :] = xe32.astype(cdt)
        xiino[o + CI2:o + 2 * CI2, :] = xo32.astype(cdt)
        xiino[o + 2 * CI2:o + 3 * CI2, :] = _roll_m1(xe32, Th).astype(cdt)


def _build_x2(xiine, xiino, xi4e, xi4o, w3_ref, b3_ref, R, G0x, F, Th,
              cdt):
    """conv3+bias+relu rows (x2 window row r = global G0x+r), written as
    interleaved conv4 im2col blocks. OOB rows are explicitly zeroed
    (relu(0 + b3) would otherwise leak the bias)."""
    b3 = b3_ref[:].astype(cdt)
    for r in range(R):
        gx = G0x + r
        valid = (gx >= 0) & (gx < F)
        x2e = jnp.dot(w3_ref[:], xiine[3 * CI2 * r:3 * CI2 * (r + 3), :],
                      preferred_element_type=jnp.float32)
        x2o = jnp.dot(w3_ref[:], xiino[3 * CI2 * r:3 * CI2 * (r + 3), :],
                      preferred_element_type=jnp.float32)
        # cdt rounding + cdt bias add, relu in f32 (Mosaic: no bf16 cmp)
        x2e = jnp.where(valid, jax.nn.relu(
            (x2e.astype(cdt) + b3).astype(jnp.float32)), 0.0)
        x2o = jnp.where(valid, jax.nn.relu(
            (x2o.astype(cdt) + b3).astype(jnp.float32)), 0.0)
        o = 3 * C2 * r
        xi4e[o:o + C2, :] = _roll_p1(x2o, Th).astype(cdt)
        xi4e[o + C2:o + 2 * C2, :] = x2e.astype(cdt)
        xi4e[o + 2 * C2:o + 3 * C2, :] = x2o.astype(cdt)
        xi4o[o:o + C2, :] = x2e.astype(cdt)
        xi4o[o + C2:o + 2 * C2, :] = x2o.astype(cdt)
        xi4o[o + 2 * C2:o + 3 * C2, :] = _roll_m1(x2e, Th).astype(cdt)


def _fwd2_kernel(xe_m, xe_0, xe_p, xo_m, xo_0, xo_p,
                 w3_ref, b3_ref, w4_ref, b4_ref, out_ref, idx_ref,
                 xiine, xiino, xi4e, xi4o, *, CH, F, nc, Th, cdt):
    G0 = 2 * CH * pl.program_id(1)
    _build_xiin((xe_m, xe_0, xe_p), (xo_m, xo_0, xo_p), xiine, xiino,
                CH, 2, 2 * CH + 4, G0, F, nc, Th, cdt)
    _build_x2(xiine, xiino, xi4e, xi4o, w3_ref, b3_ref,
              2 * CH + 2, G0 - 1, F, Th, cdt)
    b4 = b4_ref[:].astype(cdt)
    for j in range(CH):
        vs = []
        for q in (0, 1):
            m = 2 * j + q
            for xi in (xi4e, xi4o):
                y = jnp.dot(w4_ref[:], xi[3 * C2 * m:3 * C2 * (m + 3), :],
                            preferred_element_type=jnp.float32)
                vs.append(y.astype(cdt).astype(jnp.float32))
        best = vs[0]
        idx = jnp.zeros(best.shape, jnp.int32)
        for i in (1, 2, 3):
            take = vs[i] > best
            best = jnp.where(take, vs[i], best)
            idx = jnp.where(take, i, idx)
        pooled = jax.nn.relu((best.astype(cdt) + b4).astype(jnp.float32))
        out_ref[0, j] = pooled.astype(out_ref.dtype)
        idx_ref[0, j] = idx.astype(jnp.uint8)


def _bwd2_kernel(xe_m, xe_0, xe_p, xo_m, xo_0, xo_p,
                 w3_ref, b3_ref, w4_ref,
                 g_0, g_lo, g_hi, out_0, out_lo, out_hi,
                 idx_0, idx_lo, idx_hi,
                 dxe_out, dxo_out, dw3_ref, db3_ref, dw4_ref, db4_ref,
                 xiine, xiino, xi4e, xi4o, dx2e, dx2o, dxie, dxio, dA_s,
                 *, CH, F, Fp, nc, Th, cdt):
    """Unrolled loops (static scheduling — the fori/dynamic-slice variant
    measured 25% slower) with every large temporary routed through the
    dA_s scratch ref: Mosaic does NOT reuse stack slots across unrolled
    iterations, so value-temporaries of this size (0.9 MB x 16 uses)
    blow the 16 MB scoped-vmem budget and spill to HBM."""
    b = pl.program_id(0)
    c = pl.program_id(1)
    G0 = 2 * CH * c

    @pl.when((b == 0) & (c == 0))
    def _():
        dw3_ref[:] = jnp.zeros_like(dw3_ref)
        db3_ref[:] = jnp.zeros_like(db3_ref)
        dw4_ref[:] = jnp.zeros_like(dw4_ref)
        db4_ref[:] = jnp.zeros_like(db4_ref)

    # forward replay over the EXTENDED window (input kw in [0, 2CH+8),
    # x2 xw in [0, 2CH+6): globals G0+kw-4 / G0+xw-3)
    _build_xiin((xe_m, xe_0, xe_p), (xo_m, xo_0, xo_p), xiine, xiino,
                CH, 4, 2 * CH + 8, G0, F, nc, Th, cdt)
    _build_x2(xiine, xiino, xi4e, xi4o, w3_ref, b3_ref,
              2 * CH + 6, G0 - 3, F, Th, cdt)

    dx2e[:] = jnp.zeros_like(dx2e)
    dx2o[:] = jnp.zeros_like(dx2o)
    dw4_acc = jnp.zeros((C2, 9 * C2), jnp.float32)
    db4_acc = jnp.zeros((C2, 1), jnp.float32)
    # pooled window jw in [0, CH+2): global f' = CH*c + jw - 1. The two
    # halo rows complete the border x2 gradients; only interior rows
    # contribute to dW4/db4 (the neighbor counts its own).
    for jw in range(CH + 2):
        fp_g = CH * c + jw - 1
        interior = 1 <= jw <= CH
        pvalid = (fp_g >= 0) & (fp_g < Fp)
        if jw == 0:
            o_ref, g_ref_, i_ref, loc = out_lo, g_lo, idx_lo, 0
        elif jw == CH + 1:
            o_ref, g_ref_, i_ref, loc = out_hi, g_hi, idx_hi, 0
        else:
            o_ref, g_ref_, i_ref, loc = out_0, g_0, idx_0, jw - 1
        out_v = o_ref[0, loc].astype(jnp.float32)
        g = jnp.where(pvalid & (out_v > 0),
                      g_ref_[0, loc].astype(jnp.float32), 0.0)
        idx = i_ref[0, loc].astype(jnp.int32)
        if interior:
            db4_acc += jnp.sum(g, axis=1, keepdims=True)
        for q in (0, 1):
            mw = 2 * jw + q      # conv4 window row (global G0 + mw - 2)
            for p, xi in enumerate((xi4e, xi4o)):
                dy = jnp.where(idx == 2 * q + p, g, 0.0).astype(cdt)
                A = xi[3 * C2 * mw:3 * C2 * (mw + 3), :]
                if interior:
                    dw4_acc += jax.lax.dot_general(
                        dy, A, (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32)
                # W4p^T @ dy, materialized into the reused scratch
                dA_s[:9 * C2, :] = jax.lax.dot_general(
                    w4_ref[:], dy, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                for df in range(3):
                    ro = C2 * (mw + df)
                    o = 3 * C2 * df
                    v0 = dA_s[o:o + C2, :]
                    v1 = dA_s[o + C2:o + 2 * C2, :]
                    v2 = dA_s[o + 2 * C2:o + 3 * C2, :]
                    if p == 0:
                        dx2o[ro:ro + C2, :] += (
                            _roll_m1(v0, Th) + v2).astype(cdt)
                        dx2e[ro:ro + C2, :] += v1.astype(cdt)
                    else:
                        dx2e[ro:ro + C2, :] += (
                            v0 + _roll_p1(v2, Th)).astype(cdt)
                        dx2o[ro:ro + C2, :] += v1.astype(cdt)
    dw4_ref[:] += dw4_acc
    db4_ref[:] += db4_acc

    # x2 gradients are complete for xw in [2, 2CH+4); dW3/db3 count only
    # interior rows (xw in [3, 3+2CH), global gx in [G0, G0+2CH)); all
    # complete rows scatter into the input-grad accumulators.
    dxie[:] = jnp.zeros_like(dxie)
    dxio[:] = jnp.zeros_like(dxio)
    dw3_acc = jnp.zeros((C2, 9 * CI2), jnp.float32)
    db3_acc = jnp.zeros((C2, 1), jnp.float32)
    for xw in range(2, 2 * CH + 4):
        o = 3 * C2 * xw
        x2e = xi4e[o + C2:o + 2 * C2, :].astype(jnp.float32)
        x2o = xi4e[o + 2 * C2:o + 3 * C2, :].astype(jnp.float32)
        dy3e = jnp.where(
            x2e > 0, dx2e[C2 * xw:C2 * (xw + 1), :].astype(jnp.float32),
            0.0).astype(cdt)
        dy3o = jnp.where(
            x2o > 0, dx2o[C2 * xw:C2 * (xw + 1), :].astype(jnp.float32),
            0.0).astype(cdt)
        if 3 <= xw < 3 + 2 * CH:
            db3_acc += (jnp.sum(dy3e.astype(jnp.float32), axis=1,
                                keepdims=True)
                        + jnp.sum(dy3o.astype(jnp.float32), axis=1,
                                  keepdims=True))
            dw3_acc += jax.lax.dot_general(
                dy3e, xiine[3 * CI2 * xw:3 * CI2 * (xw + 3), :],
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            dw3_acc += jax.lax.dot_general(
                dy3o, xiino[3 * CI2 * xw:3 * CI2 * (xw + 3), :],
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
        for p, dy3 in enumerate((dy3e, dy3o)):
            dA_s[:9 * CI2, :] = jax.lax.dot_general(
                w3_ref[:], dy3, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            for df in range(3):
                ro = CI2 * (xw + df)
                o3 = 3 * CI2 * df
                v0 = dA_s[o3:o3 + CI2, :]
                v1 = dA_s[o3 + CI2:o3 + 2 * CI2, :]
                v2 = dA_s[o3 + 2 * CI2:o3 + 3 * CI2, :]
                if p == 0:
                    dxio[ro:ro + CI2, :] += (
                        _roll_m1(v0, Th) + v2).astype(cdt)
                    dxie[ro:ro + CI2, :] += v1.astype(cdt)
                else:
                    dxie[ro:ro + CI2, :] += (
                        v0 + _roll_p1(v2, Th)).astype(cdt)
                    dxio[ro:ro + CI2, :] += v1.astype(cdt)
    dw3_ref[:] += dw3_acc
    db3_ref[:] += db3_acc

    # interior input-grad rows: window kw in [4, 4+2CH) = globals
    # [G0, G0+2CH) — exactly this cell's output block
    for jj in range(2 * CH):
        k = jj + 4
        dxe_out[0, jj] = dxie[CI2 * k:CI2 * (k + 1), :].astype(
            dxe_out.dtype)
        dxo_out[0, jj] = dxio[CI2 * k:CI2 * (k + 1), :].astype(
            dxo_out.dtype)


def _pack2(w3, b3, w4, b4, cdt):
    w3p = jnp.transpose(w3, (3, 0, 1, 2)).reshape(C2, 9 * CI2).astype(cdt)
    w4p = jnp.transpose(w4, (3, 0, 1, 2)).reshape(C2, 9 * C2).astype(cdt)
    return (w3p, b3.reshape(C2, 1).astype(cdt),
            w4p, b4.reshape(C2, 1).astype(cdt))


def _specs2(CH, F, Th, cdt, nc):
    def chunk_spec(off):
        def imap(b, c):
            cc = jnp.maximum(jnp.minimum(c + off, nc - 1), 0)
            return (b, cc, 0, 0)
        return pl.BlockSpec((1, 2 * CH, CI2, Th), imap,
                            memory_space=pltpu.VMEM)

    in_specs = [chunk_spec(-1), chunk_spec(0), chunk_spec(1)]
    w_specs = [
        pl.BlockSpec((C2, 9 * CI2), lambda b, c: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((C2, 1), lambda b, c: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((C2, 9 * C2), lambda b, c: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((C2, 1), lambda b, c: (0, 0),
                     memory_space=pltpu.VMEM),
    ]
    return in_specs, w_specs


def _fwd2_pallas(xe, xo, w3p, b3c, w4p, b4c, *, F, CH, cdt, interpret):
    B, _, _, Th = xe.shape
    Fp = F // 2
    nc = Fp // CH
    in_specs, w_specs = _specs2(CH, F, Th, cdt, nc)
    scratch = [
        pltpu.VMEM((3 * CI2 * (2 * CH + 4), Th), cdt),   # XIin e
        pltpu.VMEM((3 * CI2 * (2 * CH + 4), Th), cdt),   # XIin o
        pltpu.VMEM((3 * C2 * (2 * CH + 2), Th), cdt),    # XI4 e
        pltpu.VMEM((3 * C2 * (2 * CH + 2), Th), cdt),    # XI4 o
    ]
    out, idx = pl.pallas_call(
        functools.partial(_fwd2_kernel, CH=CH, F=F, nc=nc, Th=Th, cdt=cdt),
        grid=(B, nc),
        in_specs=in_specs + in_specs + w_specs,
        out_specs=[
            pl.BlockSpec((1, CH, C2, Th), lambda b, c: (b, c, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, CH, C2, Th), lambda b, c: (b, c, 0, 0),
                         memory_space=pltpu.VMEM)],
        out_shape=[
            jax.ShapeDtypeStruct((B, Fp, C2, Th), cdt),
            jax.ShapeDtypeStruct((B, Fp, C2, Th), jnp.uint8)],
        scratch_shapes=scratch,
        interpret=interpret,
    )(xe, xe, xe, xo, xo, xo, w3p, b3c, w4p, b4c)
    return out, idx


def _bwd2_pallas(xe, xo, w3p, b3c, w4p, out, idx, g,
                 *, F, CH, cdt, interpret):
    B, _, _, Th = xe.shape
    Fp = F // 2
    nc = Fp // CH
    in_specs, w_specs = _specs2(CH, F, Th, cdt, nc)
    S, R = 2 * CH + 8, 2 * CH + 6
    scratch = [
        pltpu.VMEM((3 * CI2 * S, Th), cdt),
        pltpu.VMEM((3 * CI2 * S, Th), cdt),
        pltpu.VMEM((3 * C2 * R, Th), cdt),
        pltpu.VMEM((3 * C2 * R, Th), cdt),
        pltpu.VMEM((C2 * R, Th), cdt),   # dx2 e   (accumulators in cdt:
        pltpu.VMEM((C2 * R, Th), cdt),   # dx2 o    the composite path's
        pltpu.VMEM((CI2 * S, Th), cdt),  # dxi e    conv grads round to
        pltpu.VMEM((CI2 * S, Th), cdt),  # dxi o    cdt between ops too)
        pltpu.VMEM((9 * C2, Th), jnp.float32),   # dA_s (reused temp)
    ]
    pooled_chunk = pl.BlockSpec((1, CH, C2, Th), lambda b, c: (b, c, 0, 0),
                                memory_space=pltpu.VMEM)

    def halo_spec(off):
        def imap(b, c):
            r = jnp.maximum(jnp.minimum(c * CH + off, Fp - 1), 0)
            return (b, r, 0, 0)
        return pl.BlockSpec((1, 1, C2, Th), imap, memory_space=pltpu.VMEM)

    pooled_specs = [pooled_chunk, halo_spec(-1), halo_spec(CH)]
    acc = lambda rows, cols: pl.BlockSpec(
        (rows, cols), lambda b, c: (0, 0), memory_space=pltpu.VMEM)
    outg = pl.BlockSpec((1, 2 * CH, CI2, Th), lambda b, c: (b, c, 0, 0),
                        memory_space=pltpu.VMEM)
    res = pl.pallas_call(
        functools.partial(_bwd2_kernel, CH=CH, F=F, Fp=Fp, nc=nc, Th=Th,
                          cdt=cdt),
        grid=(B, nc),
        in_specs=(in_specs + in_specs
                  + [w_specs[0], w_specs[1], w_specs[2]]
                  + pooled_specs + pooled_specs + pooled_specs),
        out_specs=[outg, outg, acc(C2, 9 * CI2), acc(C2, 1),
                   acc(C2, 9 * C2), acc(C2, 1)],
        out_shape=[
            jax.ShapeDtypeStruct((B, 2 * Fp, CI2, Th), cdt),
            jax.ShapeDtypeStruct((B, 2 * Fp, CI2, Th), cdt),
            jax.ShapeDtypeStruct((C2, 9 * CI2), jnp.float32),
            jax.ShapeDtypeStruct((C2, 1), jnp.float32),
            jax.ShapeDtypeStruct((C2, 9 * C2), jnp.float32),
            jax.ShapeDtypeStruct((C2, 1), jnp.float32)],
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(xe, xe, xe, xo, xo, xo, w3p, b3c, w4p,
      g, g, g, out, out, out, idx, idx, idx)
    return res


def _block2_phase_split(x_t, cdt):
    # x_t (B, F, CI2, T) -> even/odd-t halves (B, F, CI2, T//2)
    x = x_t.astype(cdt)
    return x[..., 0::2], x[..., 1::2]


def _block2_fwd(x_t, w3, b3, w4, b4, cdt):
    B, F, _, T = x_t.shape
    CH = _pick_chunk2(F // 2, 4)  # CH=8 exceeds VMEM (16 MB) at T=400
    xe, xo = _block2_phase_split(x_t, cdt)
    w3p, b3c, w4p, b4c = _pack2(w3, b3, w4, b4, cdt)
    interpret = jax.default_backend() == "cpu"
    out_t, idx = _fwd2_pallas(xe, xo, w3p, b3c, w4p, b4c,
                              F=F, CH=CH, cdt=cdt, interpret=interpret)
    return out_t, idx


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def vgg_block2(x_t, w3, b3, w4, b4, cdt=jnp.bfloat16):
    """Fused conv3+relu+conv4+pool+bias+relu in transposed layout.
    x_t: (B, F, 64, T) — block1's transposed output. w3 (3,3,64,128),
    w4 (3,3,128,128), b3/b4 (128,). Returns (B, F//2, 128, T//2)."""
    out_t, _ = _block2_fwd(x_t, w3, b3, w4, b4, cdt)
    return out_t


def _vjp2_fwd(x_t, w3, b3, w4, b4, cdt):
    out_t, idx = _block2_fwd(x_t, w3, b3, w4, b4, cdt)
    return out_t, (x_t, w3, b3, w4, b4, out_t, idx)


def _vjp2_bwd(cdt, res, g_t):
    x_t, w3, b3, w4, b4, out_t, idx = res
    B, F, _, T = x_t.shape
    CH = _pick_chunk2(F // 2, 2)  # the extended-halo backward is VMEM-fat
    xe, xo = _block2_phase_split(x_t, cdt)
    w3p, b3c, w4p, _ = _pack2(w3, b3, w4, b4, cdt)
    interpret = jax.default_backend() == "cpu"
    dxe, dxo, dw3p, db3, dw4p, db4 = _bwd2_pallas(
        xe, xo, w3p, b3c, w4p, out_t, idx, g_t.astype(cdt),
        F=F, CH=CH, cdt=cdt, interpret=interpret)
    # interleave the phase grads back to (B, F, CI2, T)
    dx = jnp.stack([dxe, dxo], axis=-1).reshape(B, F, CI2, T)
    dw3 = jnp.transpose(dw3p.reshape(C2, 3, 3, CI2),
                        (1, 2, 3, 0)).astype(w3.dtype)
    dw4 = jnp.transpose(dw4p.reshape(C2, 3, 3, C2),
                        (1, 2, 3, 0)).astype(w4.dtype)
    return (dx.astype(x_t.dtype), dw3, db3.reshape(-1).astype(b3.dtype),
            dw4, db4.reshape(-1).astype(b4.dtype))


vgg_block2.defvjp(_vjp2_fwd, _vjp2_bwd)
