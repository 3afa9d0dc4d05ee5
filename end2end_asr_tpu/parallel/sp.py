"""Sequence parallelism (Megatron-SP) for the encoder, via GSPMD
sharding constraints.

With tensor parallelism active (parallel/tp.py: q/k/v/w1 column-sharded,
out/w2 row-sharded on the 'model' mesh axis), plain TP replicates every
activation and pays one all-reduce after each row-parallel matmul. SP
additionally shards the encoder's TIME axis across 'model' in the
segments BETWEEN the sharded matmuls — residual stream, LayerNorm,
dropout — which are pointwise over time. GSPMD then lowers each
all-reduce as reduce-scatter(T) and inserts an all-gather(T) at the next
matmul entry: identical communication volume, identical numerics (up to
fp reduction order), and the big (B, T, dim_model) activations in those
segments shrink by the model-axis size. This is the standard
Megatron-LM sequence-parallelism recipe (Korthikanti et al. 2022),
expressed as sharding constraints instead of explicit collectives.

No reference counterpart: the reference's only parallelism is
DataParallel (train.py:204-207); SP composes with the TP axis that
already goes beyond it.

Mechanics: the active mesh is installed process-wide by train/test
before tracing (install(mesh)); `seq(x)` / `full(x)` are no-ops unless
installed, so models/layers.py can call them unconditionally. The jitted
step memo key includes cfg.seq_parallel (training/steps.py _JIT_CACHE),
and install() is always paired with cfg.seq_parallel=True, so a memoized
trace never disagrees with the installed state for a given cfg.
"""

from typing import Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

_MESH: Optional[Mesh] = None
# monotonically increasing install generation: the jitted-step memo
# (training/steps.py) keys traces on this instead of id(_MESH) — a GC'd
# mesh whose address is reused by a new Mesh must never revive a trace
# baked for the old mesh's shardings (ADVICE r4)
_GEN: int = 0


def install(mesh: Optional[Mesh]) -> None:
    """Enable SP constraints on this mesh (None = disable). Call before
    tracing any jitted step with cfg.seq_parallel=True."""
    global _MESH, _GEN
    if mesh is not None and "model" not in mesh.axis_names:
        raise ValueError(f"seq-parallel needs a 'model' mesh axis, got "
                         f"{mesh.axis_names}")
    _MESH = mesh
    _GEN += 1


def active() -> bool:
    return _MESH is not None


def check_seq_divisible(T: int) -> None:
    """T must split evenly across the model axis; constraints on a
    non-divisible dim would force GSPMD padding (correct but wasteful),
    so reject loudly — encoder T is a static bucket bound, pick buckets
    divisible by mesh_model."""
    if _MESH is None:
        return
    n = _MESH.shape["model"]
    if T % n != 0:
        raise ValueError(
            f"--seq-parallel: encoder time dim {T} must be divisible by "
            f"the model-axis size {n} (adjust --src-buckets)")


def seq(x: jax.Array) -> jax.Array:
    """Constrain a (B, T, H) activation to shard T on 'model' (and B on
    'data'). Identity when SP is off."""
    if _MESH is None:
        return x
    return jax.lax.with_sharding_constraint(
        x, NamedSharding(_MESH, P("data", "model", None)))


def full(x: jax.Array) -> jax.Array:
    """Constrain a (B, T, H) activation to be full (B-sharded only) —
    the entry layout of the head/inner-sharded matmuls. Identity when
    SP is off."""
    if _MESH is None:
        return x
    return jax.lax.with_sharding_constraint(
        x, NamedSharding(_MESH, P("data", None, None)))
