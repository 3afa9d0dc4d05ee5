"""ZeRO sharding over the 'data' mesh axis: stage 1 (--zero1) shards
the optimizer moments; stage 3 (--fsdp) additionally shards the
parameters (grads follow by GSPMD propagation — FSDP).

Beyond the reference's capability envelope (its only parallelism is
single-process nn.DataParallel — train.py:97-99, SURVEY.md §2.3; its
optimizer state is fully replicated per GPU by construction): with
--zero1, every optimizer-moment leaf is laid out sharded over the
data-parallel axis (ZeRO stage 1, Rajbhandari et al. 2020). For Adam
that removes 2/3 of the optimizer memory per device at data-parallel
degree N — mu and nu each hold 1/N — while params and grads stay as
the base configuration lays them out.

TPU mapping. No hand-written collectives and no separate
reduce-scatter/all-gather schedule: the moments carry NamedShardings
with 'data' on their largest divisible dim, and XLA GSPMD partitions
the Adam update — each device updates only its moment shard (reading
the matching slice of the gradient, which is already materialized
per-device by the data-parallel gradient psum) and the parameter
delta is all-gathered back to the replicated parameter layout. The
update math is unchanged; only the layout is, so training numerics
stay exact up to XLA reduction scheduling (pinned vs the unsharded
path in tests/test_zero1.py).

Composition: the spec builder starts from the tensor-parallel specs
(parallel/tp.py param_pspecs) and adds 'data' on a FREE dim, so
--zero1 stacks with --mesh-model N (moments then shard over data AND
model) and with --mesh-pipe (the optimizer runs in the surrounding
GSPMD program, outside the shard_map'd pipeline region). Leaves with
no dim divisible by the data-axis size (scalars, small biases, odd
vocab rows) stay at their base layout — reported by coverage().

Like parallel/sp.py / pp.py, the active mesh is installed
process-wide before tracing (install(mesh)) so the jitted train step
can constrain its optimizer-state outputs to the sharded layout
(keeps the donated input/output layouts aliased and stops GSPMD from
"helpfully" replicating the new moments); the jitted-step memo keys
on it (training/steps.py).
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from end2end_asr_tpu.parallel.tp import mesh_model_size, param_pspecs

_MESH: Optional[Mesh] = None
_STAGE: int = 0  # 0 = off, 1 = moments sharded, 3 = + params/grads (FSDP)
# install generation for the jitted-step memo key (see parallel/sp.py)
_GEN: int = 0

# optimizer-state keys whose leaves mirror the param tree (Adam moments,
# SGD momentum buffer) — everything else (step, lr scalars) replicates
_MOMENT_KEYS = ("mu", "nu", "buf")

# param subtrees that must stay replicated under FSDP: the conv frontend
# feeds the Pallas kernels, whose custom_partitioning rules
# (ops/partition.py) declare batch-sharded activations + REPLICATED
# weights — sharding these leaves would break the partition contracts.
# They are a few % of the params (vgg: ~260K of the AiShell model's ~20M).
_FSDP_REPLICATED_SUBTREES = ("frontend",)


def install(mesh: Optional[Mesh], stage: int = 1) -> None:
    """Enable ZeRO sharding on this mesh (None = disable). stage=1
    shards only the optimizer moments (--zero1); stage=3 additionally
    lays the parameters out sharded over 'data' (--fsdp; grads follow
    by GSPMD propagation). Call before tracing any jitted step."""
    global _MESH, _STAGE, _GEN
    if mesh is not None and "data" not in mesh.axis_names:
        raise ValueError(f"--zero1/--fsdp need a 'data' mesh axis, got "
                         f"{mesh.axis_names}")
    if stage not in (1, 3):
        raise ValueError(f"ZeRO stage must be 1 or 3, got {stage}")
    _MESH = mesh
    _STAGE = stage if mesh is not None else 0
    _GEN += 1


def active() -> bool:
    return _MESH is not None


def stage() -> int:
    return _STAGE


def _add_data_axis(spec: P, shape, n_data: int) -> P:
    """Extend a leaf's base (TP) spec with 'data' on the largest free
    dim divisible by the data-axis size; unchanged if none divides."""
    if n_data <= 1 or not shape:
        return spec
    entries = list(spec) + [None] * (len(shape) - len(spec))
    best, best_size = -1, 0
    for i, (dim, taken) in enumerate(zip(shape, entries)):
        if taken is None and dim % n_data == 0 and dim > best_size:
            best, best_size = i, dim
    if best < 0:
        return spec
    entries[best] = "data"
    while entries and entries[-1] is None:
        entries.pop()
    return P(*entries)


def moment_pspecs(params, mesh: Mesh):
    """Pytree of PartitionSpecs for ONE moment tree mirroring `params`:
    the TP spec of each param leaf plus 'data' on its largest free
    divisible dim."""
    n_data = mesh.shape.get("data", 1)
    n_model = mesh_model_size(mesh)
    base = param_pspecs(params, n_model)
    return jax.tree_util.tree_map(
        lambda leaf, s: _add_data_axis(s, np.shape(leaf), n_data),
        params, base)


def coverage(params, mesh: Mesh) -> float:
    """Fraction of moment ELEMENTS that actually shard over 'data'
    (leaves with no divisible free dim stay replicated)."""
    specs = moment_pspecs(params, mesh)
    tot, covered = 0, 0
    for leaf, s in zip(jax.tree_util.tree_leaves(params),
                       jax.tree_util.tree_leaves(
                           specs, is_leaf=lambda x: isinstance(x, P))):
        n = int(np.prod(np.shape(leaf))) if np.ndim(leaf) else 1
        tot += n
        if "data" in tuple(s):
            covered += n
    return covered / max(1, tot)


def fsdp_pspecs(params, mesh: Mesh):
    """PartitionSpecs for the PARAMETERS under ZeRO-3/FSDP: same
    'data'-on-largest-free-dim rule as the moments (composing with any
    TP axes), except the Pallas-consumed subtrees
    (_FSDP_REPLICATED_SUBTREES) stay replicated. GSPMD all-gathers each
    weight at its use sites and reduce-scatters its gradient — the
    classic weight-gathered FSDP schedule, from layout annotations
    alone."""
    n_data = mesh.shape.get("data", 1)
    n_model = mesh_model_size(mesh)
    base = param_pspecs(params, n_model)

    def leaf_spec(path, leaf, s):
        keys = [getattr(k, "key", None) for k in path]
        if keys and keys[0] in _FSDP_REPLICATED_SUBTREES:
            return s  # keep the base (TP/replicated) layout
        return _add_data_axis(s, np.shape(leaf), n_data)

    return jax.tree_util.tree_map_with_path(leaf_spec, params, base)


def shard_params_fsdp(mesh: Mesh, params):
    """device_put the param tree with FSDP layouts (stage 3)."""
    specs = fsdp_pspecs(params, mesh)
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
        params, specs)


def constrain_params(new_params, mesh: Optional[Mesh] = None):
    """Inside-jit: pin the updated params to their between-steps layout.

    Stage 3: the FSDP specs, so the donated buffers alias and the
    weights stay sharded between steps.

    Stage 1: the base TP specs (replicated over 'data') — NOT a no-op.
    Without the pin, GSPMD leaves the updated params in the layout the
    Adam update computed them in (sharded over 'data' like the moments,
    found by tests/test_sharding_lowering.py): numerically fine, but
    the donated replicated input can't alias the sharded output, and
    the next step's call sees differently-laid-out params and
    recompiles. Pinning here makes the program itself do the classic
    ZeRO-1 all-gather of the updated shards."""
    mesh = mesh if mesh is not None else _MESH
    if mesh is None or _STAGE < 1:
        return new_params
    if _STAGE < 3:
        base = param_pspecs(new_params, mesh_model_size(mesh))
        return jax.tree_util.tree_map(
            lambda x, s: jax.lax.with_sharding_constraint(
                x, NamedSharding(mesh, s)), new_params, base)
    specs = fsdp_pspecs(new_params, mesh)
    return jax.tree_util.tree_map(
        lambda x, s: jax.lax.with_sharding_constraint(
            x, NamedSharding(mesh, s)), new_params, specs)


def shard_opt_state(mesh: Mesh, opt_state, params):
    """device_put the optimizer state with ZeRO-1 layouts: moments
    sharded over 'data' (+ any TP axes), scalars replicated. Drop-in
    replacement for parallel.tp.shard_opt_state when --zero1 is on."""
    specs = moment_pspecs(params, mesh)
    rep = NamedSharding(mesh, P())
    out = {}
    for key, val in opt_state.items():
        if key in _MOMENT_KEYS:
            out[key] = jax.tree_util.tree_map(
                lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
                val, specs)
        else:
            out[key] = jax.tree_util.tree_map(
                lambda x: jax.device_put(x, rep), val)
    return out


def constrain_opt(opt_state, params, mesh: Optional[Mesh] = None):
    """Inside-jit: pin the updated optimizer state to the ZeRO-1 layout
    so the donated input/output buffers alias and GSPMD keeps the
    moment shards resident instead of re-replicating them."""
    mesh = mesh if mesh is not None else _MESH
    if mesh is None:
        return opt_state
    specs = moment_pspecs(params, mesh)
    out = {}
    for key, val in opt_state.items():
        if key in _MOMENT_KEYS:
            out[key] = jax.tree_util.tree_map(
                lambda x, s: jax.lax.with_sharding_constraint(
                    x, NamedSharding(mesh, s)), val, specs)
        else:
            out[key] = val
    return out
