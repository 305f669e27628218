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

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(devices=None, axis_name="data"):
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


def batch_sharding(mesh, axis_name="data"):
    return NamedSharding(mesh, P(axis_name))


def replicated_sharding(mesh):
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh, axis_name="data"):
    """Place a host batch (or tuple of arrays) sharded over the mesh."""
    sh = batch_sharding(mesh, axis_name)
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)


def replicate(tree, mesh):
    """Replicate params/opt-state across the mesh."""
    sh = replicated_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), tree)
