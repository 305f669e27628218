"""Training-stack tests: LR schedule parity with torch MultiStepLR/warmup
semantics, checkpoint save/load roundtrip, loss decrease on a toy task, and
the reference's loss-bundle defaults."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multi_modal_image_fusion_tpu.models import create_model
from multi_modal_image_fusion_tpu.parallel.mesh import make_mesh
from multi_modal_image_fusion_tpu.train.checkpoint import (load_checkpoint,
                                                           save_checkpoint)
from multi_modal_image_fusion_tpu.train.schedules import make_lr_schedule
from multi_modal_image_fusion_tpu.train.trainer import (Trainer,
                                                        make_loss_bundle)


def test_multistep_schedule():
    # 12 epochs, 10 steps/epoch -> milestones at epochs 8 and 11
    # (reference train.py:148: round(2/3*12)=8, round(8/9*12)=11)
    sched = make_lr_schedule(1e-4, steps_per_epoch=10, num_epochs=12)
    assert float(sched(0)) == pytest.approx(1e-4)
    assert float(sched(79)) == pytest.approx(1e-4)
    assert float(sched(80)) == pytest.approx(1e-5)
    assert float(sched(109)) == pytest.approx(1e-5)
    assert float(sched(110)) == pytest.approx(1e-6)


def test_warmup_schedule():
    sched = make_lr_schedule(1e-4, steps_per_epoch=100, num_epochs=12,
                             warmup=True, warmup_factor=0.001)
    assert float(sched(0)) == pytest.approx(1e-4 * 0.001)
    assert float(sched(50)) == pytest.approx(1e-4 * (0.001 + 0.999 * 0.5))
    assert float(sched(100)) == pytest.approx(1e-4)


def test_warmup_schedule_constant():
    # reference common.py:160-163: flat warmup_factor until warmup_iters,
    # then full LR
    sched = make_lr_schedule(1e-4, steps_per_epoch=100, num_epochs=12,
                             warmup=True, warmup_factor=0.001,
                             warmup_method="constant")
    assert float(sched(0)) == pytest.approx(1e-7)
    assert float(sched(50)) == pytest.approx(1e-7)
    assert float(sched(99)) == pytest.approx(1e-7)
    assert float(sched(100)) == pytest.approx(1e-4)

    with pytest.raises(ValueError):
        make_lr_schedule(1e-4, 100, 12, warmup=True,
                         warmup_method="cosine")


def _toy_setup(model_name="deepfuse"):
    model = create_model(model_name)
    sched = make_lr_schedule(1e-3, 10, 12)
    trainer = Trainer(model, sched, mesh=make_mesh(jax.devices()[:1]))
    r = np.random.RandomState(0)
    img1 = jnp.asarray(r.rand(4, 32, 32, 1).astype("float32"))
    img2 = jnp.asarray(r.rand(4, 32, 32, 1).astype("float32"))
    batch = trainer.shard((img1, img2))
    state = trainer.init_state(jax.random.PRNGKey(0), batch)
    return trainer, state, batch


def test_loss_decreases():
    trainer, state, batch = _toy_setup()
    state, parts0, _ = trainer.train_step(state, batch)
    first = float(parts0["loss"])
    for _ in range(10):
        state, parts, _ = trainer.train_step(state, batch)
    assert float(parts["loss"]) < first


def test_loss_bundle_components():
    bundle = make_loss_bundle()
    r = np.random.RandomState(0)
    x1 = jnp.asarray(r.rand(2, 64, 64, 1).astype("float32"))
    x2 = jnp.asarray(r.rand(2, 64, 64, 1).astype("float32"))
    y = jnp.asarray(r.rand(2, 64, 64, 1).astype("float32"))
    total, parts = bundle(x1, x2, y)
    np.testing.assert_allclose(
        float(total),
        float(parts["loss1"]) + float(parts["loss2"]) +
        float(parts["loss3"]), rtol=1e-6)


def test_checkpoint_roundtrip(tmp_path):
    trainer, state, batch = _toy_setup()
    state, _, _ = trainer.train_step(state, batch)
    path = str(tmp_path / "ck.ckpt")
    save_checkpoint(path, state, {"model": "deepfuse", "epoch": 1})

    trainer2, state2, _ = _toy_setup()
    restored = load_checkpoint(path, jax.device_get(state2))
    a = jax.tree.leaves(jax.device_get(state.params))
    b = jax.tree.leaves(restored.params)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
    assert int(restored.step) == 1

    from multi_modal_image_fusion_tpu.train.checkpoint import \
        load_checkpoint_meta

    meta = load_checkpoint_meta(path)
    assert meta["model"] == "deepfuse"


def test_resumed_state_continues_training():
    trainer, state, batch = _toy_setup()
    for _ in range(3):
        state, parts, _ = trainer.train_step(state, batch)
    l3 = float(parts["loss"])
    state, parts, _ = trainer.train_step(state, batch)
    assert float(parts["loss"]) <= l3 * 1.5  # still sane after many steps
    assert int(state.step) == 4


def test_scan_steps_match_sequential():
    """K scan-chained steps (Trainer.train_steps, one dispatch) == K
    sequential train_step calls — same params, same per-step losses."""
    model = create_model("deepfuse")
    sched = make_lr_schedule(1e-4, steps_per_epoch=10, num_epochs=12)
    r = np.random.RandomState(0)
    K, B = 3, 2
    imgs1 = jnp.asarray(r.rand(K, B, 24, 24, 1), jnp.float32)
    imgs2 = jnp.asarray(r.rand(K, B, 24, 24, 1), jnp.float32)

    tr = Trainer(model, sched)
    state = tr.init_state(jax.random.PRNGKey(0), (imgs1[0], imgs2[0]))
    seq_parts = []
    for i in range(K):
        state, parts, _ = tr.train_step(state, (imgs1[i], imgs2[i]))
        seq_parts.append({k: float(v) for k, v in parts.items()})
    seq_leaf = np.asarray(jax.tree.leaves(state.params)[0])

    tr2 = Trainer(model, sched)
    state2 = tr2.init_state(jax.random.PRNGKey(0), (imgs1[0], imgs2[0]))
    state2, parts2, imgf = tr2.train_steps(state2, (imgs1, imgs2))
    scan_leaf = np.asarray(jax.tree.leaves(state2.params)[0])

    np.testing.assert_allclose(scan_leaf, seq_leaf, rtol=1e-5, atol=1e-6)
    for i in range(K):
        for k, v in seq_parts[i].items():
            np.testing.assert_allclose(float(parts2[k][i]), v, rtol=1e-5,
                                       atol=1e-6)
    assert imgf.shape == (B, 24, 24, 1)


def test_amp_bf16_trains():
    """amp='bf16' keeps f32 master params, produces finite decreasing
    loss, and tracks the f32 recipe's early loss closely."""
    model = create_model("deepfuse")
    sched = make_lr_schedule(1e-4, steps_per_epoch=10, num_epochs=12)
    r = np.random.RandomState(1)
    img1 = jnp.asarray(r.rand(2, 24, 24, 1), jnp.float32)
    img2 = jnp.asarray(r.rand(2, 24, 24, 1), jnp.float32)

    tr32 = Trainer(model, sched)
    s32 = tr32.init_state(jax.random.PRNGKey(0), (img1, img2))
    tr16 = Trainer(model, sched, amp="bf16")
    s16 = tr16.init_state(jax.random.PRNGKey(0), (img1, img2))
    assert all(p.dtype == jnp.float32
               for p in jax.tree.leaves(s16.params))

    l32 = l16 = None
    for _ in range(5):
        s32, p32, _ = tr32.train_step(s32, (img1, img2))
        s16, p16, _ = tr16.train_step(s16, (img1, img2))
        l32, l16 = float(p32["loss"]), float(p16["loss"])
        assert np.isfinite(l16)
    assert all(p.dtype == jnp.float32
               for p in jax.tree.leaves(s16.params))
    # bf16 compute noise stays small on a 5-step horizon
    assert abs(l16 - l32) < 0.05 * abs(l32) + 1e-3
