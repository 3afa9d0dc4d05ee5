"""Pipeline parallelism: a 'pipe' mesh axis running the encoder/decoder
layer stacks as a GPipe microbatch pipeline.

Beyond the reference's capability envelope (its only parallelism is
single-process nn.DataParallel — train.py:97-99, SURVEY.md §2.3): with
--mesh-pipe S, the transformer layer stacks are split into S contiguous
stages, one per device along a 'pipe' mesh axis, and each batch flows
through them as M microbatches on the classic GPipe schedule
(Huang et al. 2019): tick t has stage s working on microbatch t-s, so
all stages run concurrently after an (S-1)-tick fill. Activations hop
stage→stage over ICI via `lax.ppermute`; gradients flow back through
the very same program under `jax.grad` (ppermute transposes to the
reverse permutation), so forward AND backward are pipelined with no
hand-written backward pass.

TPU mapping. The pipeline region is a `jax.shard_map` that is MANUAL
over 'pipe' only (axis_names={'pipe'}): the 'data' (and optional
'model') mesh axes stay in GSPMD-auto mode inside the body, so data
parallelism — and Megatron tensor parallelism from parallel/tp.py —
compose with the pipeline without any code here knowing about them.
Layer parameters enter the region stacked on a leading (num_layers,)
axis with in_spec P('pipe'): each stage reads only its own
num_layers/S slice. Everything outside the layer stacks (conv
frontend, embeddings, output projection, loss, optimizer) runs in the
surrounding GSPMD program, replicated across 'pipe' — those parts are
a few % of the FLOPs; the stacks are where the depth lives.

Exactness: each microbatch sees bit-identical math to the sequential
layer loop (same layers, same order); only the batch→microbatch
regrouping changes fp summation order downstream (loss reductions),
the same caveat as --grad-accum. The microbatch split is INTERLEAVED
(microbatch m = rows [m::M]) for the same reason as
training/steps.py:_accumulated_grads — every microbatch stays exactly
batch-sharded under the 'data' axis. Dropout draws per-(layer,
microbatch) streams (fold_in of the layer key with the microbatch id),
so train-mode masks differ from the sequential path's (B,T,H)-shaped
draws — statistically identical, and deterministic per seed.

Bubble: the schedule idles S-1 of M+S-1 ticks per stage (garbage ticks
compute on zeros and their outputs are never emitted). Raise
--pipe-microbatches to amortize; default M=S gives a ~(S-1)/(2S-1)
bubble, M=4S ~ (S-1)/(5S-1).

No reference counterpart. Like parallel/sp.py, the active mesh is
installed process-wide before tracing (install(mesh, n_micro)); the
jitted-step memo keys on it (training/steps.py).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

_MESH: Optional[Mesh] = None
_N_MICRO: int = 0
# install generation for the jitted-step memo key (see parallel/sp.py)
_GEN: int = 0


def install(mesh: Optional[Mesh], n_micro: int = 0) -> None:
    """Enable pipelining on this mesh (None = disable). n_micro = 0
    defaults to the stage count. Call before tracing any jitted step
    with cfg.mesh_pipe > 1."""
    global _MESH, _N_MICRO, _GEN
    if mesh is not None and "pipe" not in mesh.axis_names:
        raise ValueError(f"pipeline parallelism needs a 'pipe' mesh axis, "
                         f"got {mesh.axis_names}")
    _MESH = mesh
    _N_MICRO = int(n_micro)
    _GEN += 1


def active() -> bool:
    return _MESH is not None


def n_stages() -> int:
    return _MESH.shape["pipe"] if _MESH is not None else 1


def check_pp_divisibility(cfg, n_pipe: int) -> None:
    """Fail fast when the stacks cannot split into equal stages."""
    if n_pipe <= 1:
        return
    if cfg.num_layers % n_pipe != 0:
        raise ValueError(
            f"--num-layers {cfg.num_layers} must be divisible by "
            f"--mesh-pipe {n_pipe} (equal layers per pipeline stage)")


def make_mesh_pipe(n_pipe: int, n_model: int = 1, n_data: int = 0,
                   devices=None) -> Mesh:
    """('data','pipe') mesh, or ('data','pipe','model') when n_model > 1
    (tensor parallelism inside each pipeline stage). n_data=0 -> all
    remaining devices. Axis order puts 'model' innermost so TP
    all-reduces ride the fastest ICI links and 'pipe' hops are
    nearest-neighbor."""
    devices = list(devices if devices is not None else jax.devices())
    if n_pipe < 1:
        raise ValueError(f"n_pipe must be >= 1, got {n_pipe}")
    per_data = n_pipe * max(1, n_model)
    if n_data and n_data > 0:
        need = n_data * per_data
        if len(devices) < need:
            raise ValueError(
                f"mesh {n_data}x{n_pipe}x{n_model} needs {need} devices, "
                f"have {len(devices)}")
    else:
        n_data = len(devices) // per_data
        if n_data < 1:
            raise ValueError(
                f"--mesh-pipe {n_pipe} x --mesh-model {max(1, n_model)} "
                f"exceeds the {len(devices)} visible devices")
        if n_data * per_data != len(devices):
            raise ValueError(
                f"--mesh-pipe {n_pipe} x --mesh-model {max(1, n_model)} "
                f"does not divide the {len(devices)} visible devices — "
                f"pass --mesh-data to use a subset explicitly")
    devices = devices[: n_data * per_data]
    if n_model > 1:
        arr = np.array(devices).reshape(n_data, n_pipe, n_model)
        return Mesh(arr, ("data", "pipe", "model"))
    arr = np.array(devices).reshape(n_data, n_pipe)
    return Mesh(arr, ("data", "pipe"))


def _interleave_split(a: jnp.ndarray, m: int) -> jnp.ndarray:
    """(B, ...) -> (M, B/M, ...) with microbatch k = rows [k::M] (keeps
    each microbatch batch-sharded under the 'data' axis)."""
    B = a.shape[0]
    return a.reshape(B // m, m, *a.shape[1:]).swapaxes(0, 1)


def _interleave_merge(a: jnp.ndarray) -> jnp.ndarray:
    """Inverse of _interleave_split: (M, B/M, ...) -> (B, ...)."""
    m, bm = a.shape[0], a.shape[1]
    return a.swapaxes(0, 1).reshape(m * bm, *a.shape[2:])


def pipeline_apply(stacked_lp, act: jnp.ndarray, consts: Tuple,
                   layer_step, n_micro: int = 0, remat: bool = False,
                   mesh: Optional[Mesh] = None) -> jnp.ndarray:
    """Run a homogeneous layer stack as a GPipe pipeline.

    stacked_lp: pytree whose leaves have leading dim L (= num layers),
        sharded P('pipe') at the region boundary — per-layer params plus
        anything per-layer the step needs (e.g. dropout keys).
    act: (B, ...) the activation entering layer 0.
    consts: tuple of (B, ...) arrays that travel WITH each microbatch
        unchanged (masks, encoder output for cross-attention, ...).
    layer_step(lp_i, act, consts, mb_id) -> act: apply ONE layer;
        lp_i is stacked_lp with the leading dim indexed, mb_id a traced
        int32 microbatch id (for RNG fold_in).
    Returns the activations after the full stack, (B, ...).
    """
    mesh = mesh if mesh is not None else _MESH
    assert mesh is not None, "pp.install(mesh) before pipeline_apply"
    S = mesh.shape["pipe"]
    L = jax.tree_util.tree_leaves(stacked_lp)[0].shape[0]
    if L % S != 0:
        raise ValueError(f"{L} layers do not split over {S} pipeline "
                         f"stages")
    L_local = L // S
    M = int(n_micro) if n_micro else (_N_MICRO or S)
    B = act.shape[0]
    if B % M != 0:
        raise ValueError(f"batch {B} not divisible by "
                         f"--pipe-microbatches {M}")

    if remat:
        layer_step = jax.checkpoint(layer_step)

    act_mb = _interleave_split(act, M)
    consts_mb = tuple(_interleave_split(c, M) for c in consts)

    def body(lp_local, act_mb, consts_mb):
        # lp_local: leaves (L_local, ...); act_mb: (M, B/M, ...)
        idx = jax.lax.axis_index("pipe")
        state = jax.lax.pcast(jnp.zeros_like(act_mb[0]), ("pipe",),
                              to="varying")
        outs = jax.lax.pcast(jnp.zeros_like(act_mb), ("pipe",),
                             to="varying")

        perm = [(i, (i + 1) % S) for i in range(S)]

        def tick(carry, t):
            state, outs = carry
            mb_in = jnp.clip(t, 0, M - 1)
            a = jnp.where(idx == 0, act_mb[mb_in], state)
            # this stage is working on microbatch t - idx (garbage
            # during fill/drain ticks; those outputs are never emitted).
            # consts enter the region replicated over 'pipe' (in_spec
            # P()), so each stage indexes its microbatch's consts
            # LOCALLY — only the activation rides ppermute (carrying the
            # consts too would shuttle enc_out + masks over ICI
            # S*(M+S-1) times for no correctness benefit, ADVICE r4).
            mb_id = jnp.clip(t - idx, 0, M - 1)
            cs = tuple(c[mb_id] for c in consts_mb)
            for i in range(L_local):
                lp_i = jax.tree_util.tree_map(lambda x: x[i], lp_local)
                a = layer_step(lp_i, a, cs, mb_id)
            out_mb = t - (S - 1)
            write = (idx == S - 1) & (out_mb >= 0)
            upd = jax.lax.dynamic_update_index_in_dim(
                outs, a, jnp.clip(out_mb, 0, M - 1), 0)
            outs = jnp.where(write, upd, outs)
            new_state = jax.lax.ppermute(a, "pipe", perm)
            return (new_state, outs), None

        (_, outs), _ = jax.lax.scan(tick, (state, outs),
                                    jnp.arange(M + S - 1))
        # broadcast the last stage's outputs to every stage (everyone
        # else holds zeros, so the psum IS the selection)
        outs = jax.lax.psum(
            jnp.where(idx == S - 1, outs, jnp.zeros_like(outs)), "pipe")
        return outs

    lp_specs = jax.tree_util.tree_map(lambda _: P("pipe"), stacked_lp)
    mb_spec = jax.tree_util.tree_map(lambda _: P(), act_mb)
    consts_specs = tuple(
        jax.tree_util.tree_map(lambda _: P(), c) for c in consts_mb)
    out = jax.shard_map(body, mesh=mesh,
                        in_specs=(lp_specs, mb_spec, consts_specs),
                        out_specs=P(),
                        axis_names={"pipe"})(stacked_lp, act_mb,
                                             consts_mb)
    return _interleave_merge(out)


def stack_layers(layers_list):
    """Stack a list of per-layer param pytrees into one pytree with a
    leading (num_layers,) dim — the layout pipeline_apply shards over
    'pipe'. Differentiable (grads unstack back to the list)."""
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *layers_list)
