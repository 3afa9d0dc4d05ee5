"""Tensor parallelism: an optional 'model' mesh axis.

Beyond the reference's capability envelope (its only parallelism is
single-process nn.DataParallel — train.py:97-99, SURVEY.md §2.3): every
attention projection and FFN inner dimension shards across a second
mesh axis, Megatron-style:

  column-parallel (output dim sharded, no communication in forward):
      mha q/k/v  (dim_model, H·d)   -> P(None, 'model')   [+ bias P('model')]
      ffn w1     (dim_model, inner) -> P(None, 'model')   [+ bias P('model')]
  row-parallel (input dim sharded, XLA inserts one all-reduce):
      mha out    (H·d, dim_model)   -> P('model', None)
      ffn w2     (inner, dim_model) -> P('model', None)

Everything else (LayerNorms, positional tables, conv frontend, the
embedding/output vocab projection, low-rank 'u'/'v' factor pairs) stays
replicated — the vocab projection is ~2 M params on AiShell and the
frontend feeds the batch-partitioned Pallas kernels, whose
custom_partitioning rules (ops/partition.py) shard on 'data' only.

No hand-written collectives: parameters carry NamedShardings and XLA
GSPMD propagates them through the jitted train/eval/decode programs,
inserting the two all-reduces per transformer layer over ICI. Adam
moments shard with their parameters (init_adam_state mirrors the param
tree), so optimizer state memory scales down with the axis too.

Head counts must divide the axis (the (B,T,H·d) -> (B,T,H,d) reshape in
models/layers.py:mha only propagates the sharding when whole heads land
on each shard); leaves whose sharded dim does not divide fall back to
replication, reported once via check_tp_divisibility.

Pallas kernels under TP: the fused train-attention kernel's Shardy rule
("x, b h t d, ..." — ops/attention_fused.py) factors over h, so head
shards run the kernel locally. Its in-kernel dropout PRNG seeds by
LOCAL grid position, so head shards draw the same mask pattern as each
other (statistically inert — masks are i.i.d. within a shard, and
forward/backward shard identically so grad masks always match). The
featurizer/vgg kernels see only 'data'-sharded activations + replicated
weights, exactly the case ops/partition.py declares.
"""

from __future__ import annotations

from typing import Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# param-tree leaf rules: (parent key, leaf key) -> sharded dim index
_COLUMN_PARENTS = ("q", "k", "v", "w1")   # shard dim 1 of w, dim 0 of b
_ROW_PARENTS = ("out", "w2")              # shard dim 0 of w, replicate b


def make_mesh_2d(n_model: int, n_data: int = 0, devices=None) -> Mesh:
    """('data', 'model') mesh. n_data=0 -> all remaining devices."""
    devices = list(devices if devices is not None else jax.devices())
    if n_model < 1:
        raise ValueError(f"n_model must be >= 1, got {n_model}")
    if n_data and n_data > 0:
        need = n_data * n_model
        if len(devices) < need:
            raise ValueError(
                f"mesh {n_data}x{n_model} needs {need} devices, have "
                f"{len(devices)}")
        devices = devices[:need]
    else:
        n_data = len(devices) // n_model
        if n_data < 1:
            raise ValueError(
                f"--mesh-model {n_model} exceeds the {len(devices)} "
                f"visible devices")
        if n_data * n_model != len(devices):
            raise ValueError(
                f"--mesh-model {n_model} does not divide the "
                f"{len(devices)} visible devices — pass --mesh-data to "
                f"use a subset explicitly instead of silently dropping "
                f"chips")
        devices = devices[: n_data * n_model]
    arr = np.array(devices).reshape(n_data, n_model)
    return Mesh(arr, ("data", "model"))


def mesh_model_size(mesh: Mesh) -> int:
    return mesh.shape.get("model", 1) if mesh is not None else 1


def _leaf_spec(path: Tuple, shape, n_model: int) -> P:
    """PartitionSpec for one param leaf, by its tree path."""
    keys = [getattr(k, "key", None) for k in path]
    leaf = keys[-1] if keys else None
    parent = keys[-2] if len(keys) >= 2 else None
    if leaf == "w" and parent in _COLUMN_PARENTS:
        if shape[1] % n_model == 0:
            return P(None, "model")
    elif leaf == "b" and parent in _COLUMN_PARENTS:
        if shape[0] % n_model == 0:
            return P("model")
    elif leaf == "w" and parent in _ROW_PARENTS:
        if shape[0] % n_model == 0:
            return P("model", *([None] * (len(shape) - 1)))
    return P()  # replicated (LN/PE/conv/embedding/bias/low-rank/fallback)


def param_pspecs(params, n_model: int):
    """Pytree of PartitionSpecs matching `params` (also valid for grads
    and for Adam mu/nu, which mirror the param tree)."""
    if n_model <= 1:
        return jax.tree_util.tree_map(lambda _: P(), params)
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: _leaf_spec(path, np.shape(leaf), n_model),
        params)


def check_tp_divisibility(cfg, n_model: int) -> None:
    """Fail fast when the model cannot split cleanly on the axis: heads
    must divide (whole heads per shard) and so must dim_inner."""
    if n_model <= 1:
        return
    if cfg.num_heads % n_model != 0:
        raise ValueError(
            f"--num-heads {cfg.num_heads} must be divisible by "
            f"--mesh-model {n_model} (whole attention heads per shard)")
    if cfg.dim_inner % n_model != 0:
        raise ValueError(
            f"--dim-inner {cfg.dim_inner} must be divisible by "
            f"--mesh-model {n_model}")


def shard_params(mesh: Mesh, params):
    """device_put the param tree with TP shardings ((data,model) mesh) or
    fully replicated (1-D data mesh)."""
    n_model = mesh_model_size(mesh)
    specs = param_pspecs(params, n_model)
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
        params, specs)


def shard_opt_state(mesh: Mesh, opt_state, params):
    """Adam/SGD state: mu/nu (Adam moments) and buf (SGD momentum)
    mirror the param tree and take its specs; scalars (step, lr)
    replicate."""
    n_model = mesh_model_size(mesh)
    specs = param_pspecs(params, n_model)
    rep = NamedSharding(mesh, P())

    out = {}
    for key, val in opt_state.items():
        if key in ("mu", "nu", "buf"):
            out[key] = jax.tree_util.tree_map(
                lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
                val, specs)
        else:
            out[key] = jax.tree_util.tree_map(
                lambda x: jax.device_put(x, rep), val)
    return out
