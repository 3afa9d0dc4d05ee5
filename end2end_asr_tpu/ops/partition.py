"""Batch-dimension SPMD partitioning for the Pallas kernels.

XLA cannot see inside a `tpu_custom_call`, so under a sharded jit a bare
pallas_call falls back to replication: every device all-gathers the full
batch, runs the whole kernel, and keeps a slice — correct but wasting
(n_devices)x compute and defeating data parallelism. The batch dimension
of every kernel in this package is embarrassingly parallel, so
`jax.experimental.custom_partitioning` declares exactly that: operands
and results shard on dim 0, weights replicate, and reduction outputs
(weight gradients) become per-shard partial sums combined with a psum
over whichever mesh axes shard the batch.

Validated on the CPU 8-virtual-device mesh (tests/test_partition.py):
interpret-mode kernels run per-shard and match the unsharded result,
including the psum-combined weight grads.
"""

from __future__ import annotations

from typing import Sequence

import jax
from jax.experimental.custom_partitioning import custom_partitioning
from jax.sharding import NamedSharding, PartitionSpec as P


def _batch_axes(arg_info):
    """Mesh axes sharding dim 0 of this operand (() if unsharded)."""
    sharding = arg_info.sharding
    if sharding is None or not isinstance(sharding, NamedSharding):
        return ()
    spec = sharding.spec
    if not spec or spec[0] is None:
        return ()
    d0 = spec[0]
    return tuple(d0) if isinstance(d0, (tuple, list)) else (d0,)


def batch_partitioned(impl, *, batch_args: Sequence[int], n_out: int,
                      reduced_out: Sequence[int] = (),
                      static_argnums: Sequence[int] = (),
                      sharding_rule: str = None):
    """Wrap `impl` so it partitions on the batch dimension under SPMD.

    batch_args: positional operand indices whose dim 0 is the batch
    (all others are replicated, e.g. packed weights).
    n_out: number of outputs (impl returns a tuple when n_out > 1).
    reduced_out: output indices that are cross-batch REDUCTIONS (weight
    grads): per-shard partials are psum'd over the batch mesh axes.
    """
    batch_args = tuple(batch_args)
    reduced_out = frozenset(reduced_out)

    fn = custom_partitioning(impl, static_argnums=tuple(static_argnums))

    def out_shardings(mesh, axes, result_infos):
        batch = NamedSharding(mesh, P(axes if len(axes) > 1 else axes[0]))
        rep = NamedSharding(mesh, P())
        single = not isinstance(result_infos, (tuple, list))
        infos = [result_infos] if single else list(result_infos)
        outs = [rep if i in reduced_out else batch
                for i in range(len(infos))]
        return outs[0] if single else tuple(outs)

    # NOTE: jax prepends the static args to every callback's arguments;
    # impl must take its static args TRAILING so lower_fn can re-append
    # them to the per-shard array operands.
    def infer(*cb_args):
        mesh, arg_infos, result_infos = cb_args[-3:]
        axes = _batch_axes(arg_infos[batch_args[0]])
        if not axes:
            rep = NamedSharding(mesh, P())
            single = not isinstance(result_infos, (tuple, list))
            return rep if single else tuple(
                rep for _ in range(len(result_infos)))
        return out_shardings(mesh, axes, result_infos)

    def partition(*cb_args):
        statics = cb_args[:-3]
        mesh, arg_infos, result_infos = cb_args[-3:]
        axes = _batch_axes(arg_infos[batch_args[0]])
        rep = NamedSharding(mesh, P())
        if axes:
            batch = NamedSharding(mesh,
                                  P(axes if len(axes) > 1 else axes[0]))
        else:
            batch = rep
        arg_sh = tuple(batch if i in batch_args else rep
                       for i in range(len(arg_infos)))
        res_sh = out_shardings(mesh, axes, result_infos) if axes else (
            infer(mesh, arg_infos, result_infos))

        def lower_fn(*args):
            res = impl(*args, *statics)
            if not reduced_out or not axes:
                return res
            single = n_out == 1
            outs = [res] if single else list(res)
            for i in reduced_out:
                outs[i] = jax.lax.psum(outs[i], axes)
            return outs[0] if single else tuple(outs)

        return mesh, lower_fn, res_sh, arg_sh

    # this JAX runs the Shardy partitioner, which takes an einsum-like
    # rule instead of the legacy callbacks (kept for non-Shardy builds)
    fn.def_partition(partition=partition,
                     infer_sharding_from_operands=infer,
                     propagate_user_sharding=lambda sharding, shape: sharding,
                     sharding_rule=sharding_rule)
    return fn
