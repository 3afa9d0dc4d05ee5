"""Device mesh + sharding rules (SPMD data parallelism).

Replaces the reference's single-process nn.DataParallel
(--parallel/--device-ids, train.py:97-99, utils/functions.py:154-161):
instead of replicating the module and scattering the batch every forward
over NCCL, parameters live resident on every device of a 1-D `data` mesh
and the batch is sharded on its leading axis; XLA inserts the gradient
all-reduce (psum) over ICI.

Multi-host: after jax.distributed initialization each process builds only
its LOCAL slice of every batch (AudioBatchLoader process_index/
process_count) and `put_sharded` assembles the global array via
jax.make_array_from_process_local_data — no host ever materializes or
transfers the full batch. Losses/grads are computed globally by XLA.
Limitation: the host-side train-CER logging decodes only locally
addressable rows, so set --metrics-every high on pods.

Tensor parallelism (beyond the reference's envelope, SURVEY.md §2.3)
lives in parallel/tp.py: --mesh-model N builds a ('data','model') 2-D
mesh and shards attention/FFN weights (and their Adam moments)
Megatron-style; batch_sharded specs below stay valid there — P('data',…)
replicates over the extra axis.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def maybe_initialize_distributed() -> None:
    """Multi-host SPMD bring-up: call once per host before any jax op.
    Reads the standard JAX cluster env (COORDINATOR_ADDRESS, NUM_PROCESSES,
    PROCESS_ID) or the TPU-pod auto-detection. No-op when single-host or
    already initialized. The same shard_map/pjit programs then span hosts,
    with gradient psums riding ICI intra-pod and DCN across pods."""
    import os

    import jax
    addr = (os.environ.get("COORDINATOR_ADDRESS")
            or os.environ.get("JAX_COORDINATOR_ADDRESS"))
    if not addr:
        return  # single-host (TPU pods auto-detect via initialize() in
        #         jax's TPU cluster envs; this path is for explicit env)
    num = (os.environ.get("NUM_PROCESSES")
           or os.environ.get("JAX_NUM_PROCESSES"))
    pid = (os.environ.get("PROCESS_ID")
           or os.environ.get("JAX_PROCESS_ID"))
    try:
        jax.distributed.initialize(
            coordinator_address=addr,
            num_processes=int(num) if num is not None else None,
            process_id=int(pid) if pid is not None else None)
    except RuntimeError:
        pass  # already initialized


def make_mesh(n_data: int = 0, devices=None) -> Mesh:
    """1-D data-parallel mesh. n_data=0 → all visible devices."""
    devices = devices if devices is not None else jax.devices()
    if n_data and n_data > 0:
        devices = devices[:n_data]
    return Mesh(np.array(devices), ("data",))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharded(mesh: Mesh, ndim: int = 1) -> NamedSharding:
    """Shard the leading (batch) axis across `data`."""
    return NamedSharding(mesh, P("data", *([None] * (ndim - 1))))


def stacked_batch_sharded(mesh: Mesh, ndim: int) -> NamedSharding:
    """Sharding for K-stacked batches (--steps-per-dispatch under a
    mesh): axis 0 is the scan/step axis (replicated), axis 1 is the
    batch axis (sharded on 'data'). jnp.stack over already-sharded
    batches yields an op-sharding the Pallas kernels' custom_partitioning
    cannot unflatten — re-constraining with this spec keeps the stacked
    program partitionable."""
    return NamedSharding(mesh, P(None, "data", *([None] * (ndim - 2))))


def put_sharded(arr, sharding: NamedSharding):
    """device_put with a sharding; under multi-host jax.distributed, the
    host array is the PROCESS-LOCAL shard and the global jax.Array is
    assembled across processes (shapes must agree — the loader guarantees
    this via header-derived buckets)."""
    if sharding is None:
        return jax.device_put(arr)
    if jax.process_count() > 1:
        return jax.make_array_from_process_local_data(
            sharding, np.asarray(arr))
    return jax.device_put(arr, sharding)


def shard_batch_dict(mesh: Mesh, arrays: dict) -> dict:
    """device_put a dict of host arrays with the batch axis sharded."""
    out = {}
    for k, v in arrays.items():
        if v is None:
            out[k] = None
        else:
            out[k] = jax.device_put(v, batch_sharded(mesh, np.ndim(v)))
    return out


def check_divisible(batch_size: int, mesh: Mesh,
                    grad_accum: int = 1) -> None:
    n = mesh.shape["data"]
    if batch_size % n != 0:
        raise ValueError(
            f"batch size {batch_size} must be divisible by the number of "
            f"devices on the data axis ({n}) — same constraint as the "
            f"reference's DataParallel (README.md:73)")
    if grad_accum > 1 and (batch_size // n) % grad_accum != 0:
        # the interleaved microbatch split (training/steps.py resh)
        # keeps each microbatch exactly batch-sharded only when
        # grad_accum divides the PER-DEVICE batch; otherwise GSPMD
        # must reshard every microbatch (or fail at the Pallas
        # custom_partitioning boundary) — reject up front.
        raise ValueError(
            f"--grad-accum {grad_accum} must divide the per-device "
            f"batch {batch_size}//{n}={batch_size // n} when training "
            f"on a mesh")
