"""Device-mesh data parallelism (TPU replacement of the reference's
single-node NCCL DDP — reference common.py:96-113, train.py:203-222,
285-297).

Design: a 1-D `data` mesh over all chips. Parameters/opt state are
replicated (P()); batches are sharded over axis 0 (P('data')). The train
step is a plain `jax.jit` — XLA's SPMD partitioner inserts the gradient
all-reduce over ICI automatically, which subsumes:

- `DistributedSampler` + per-rank batch slicing -> `shard_batch` places the
  global batch
- gradient all-reduce (DDP backward hook) -> compiler-inserted psum
- `reduce_value` loss averaging (common.py:105-113) -> jnp.mean over the
  globally sharded batch inside jit
- `SyncBatchNorm` (train.py:296) -> batch-stat reductions span the global
  batch inside jit
- init-weight file broadcast + barriers (train.py:286-294) -> replicated
  device_put of same-seed params

Multi-host: call `jax.distributed.initialize()` before `make_mesh()`; the
same code then spans hosts, with XLA routing collectives over ICI/DCN.
"""

import os

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def init_multihost():
    """Initialize the JAX distributed runtime for multi-host training.

    Honors the reference launcher's env contract (reference common.py:
    96-102 reads MASTER_ADDR / RANK / WORLD_SIZE): when WORLD_SIZE is set,
    those vars configure the coordinator explicitly — so `RANK=0
    WORLD_SIZE=2 MASTER_ADDR=host0 MASTER_PORT=12355 python -m ...train
    --multihost` works on any cluster. Without them, fall back to
    `jax.distributed.initialize()` auto-detection (TPU pods, Slurm,
    OpenMPI)."""
    world = os.environ.get("WORLD_SIZE")
    if world is not None and int(world) > 1:
        addr = os.environ.get("MASTER_ADDR", "127.0.0.1")
        port = os.environ.get("MASTER_PORT", "12355")
        jax.distributed.initialize(
            coordinator_address=f"{addr}:{port}",
            num_processes=int(world),
            process_id=int(os.environ.get("RANK", "0")))
    else:
        jax.distributed.initialize()


def is_main_process():
    """True on the process that should write checkpoints/logs/TB (the
    reference gates these on rank 0: train.py:100, 121, 167, 354)."""
    return jax.process_index() == 0


def make_mesh(devices=None, axis_name="data"):
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


def batch_sharding(mesh, axis_name="data"):
    return NamedSharding(mesh, P(axis_name))


def replicated_sharding(mesh):
    return NamedSharding(mesh, P())


def place_sharded(x, sharding):
    """Place one host array with `sharding`. Single-process: a plain
    device_put. Multi-process (every process holds the identical GLOBAL
    batch — the feeders are seed-deterministic): assemble the global array
    from each process's addressable shards via make_array_from_callback,
    which is correct for any device order in the mesh."""
    if jax.process_count() == 1:
        return jax.device_put(x, sharding)
    x = np.asarray(x)
    return jax.make_array_from_callback(x.shape, sharding,
                                        lambda idx: x[idx])


def shard_batch(batch, mesh, axis_name="data"):
    """Place a host batch (or tuple of arrays) sharded over the mesh."""
    sh = batch_sharding(mesh, axis_name)
    return jax.tree.map(lambda x: place_sharded(x, sh), batch)


def replicate(tree, mesh):
    """Replicate params/opt-state across the mesh."""
    sh = replicated_sharding(mesh)
    return jax.tree.map(lambda x: place_sharded(x, sh), tree)
