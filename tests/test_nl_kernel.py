"""Flash nl-attention kernel (ops/pallas/nl_kernel.py) parity vs the XLA
streaming path and the dense reference math (reference core/fusion.py:84-117).
Runs in Pallas interpret mode on CPU."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from multi_modal_image_fusion_tpu.ops import fusion as F
from multi_modal_image_fusion_tpu.ops.pallas.nl_kernel import nl_spatial_flash


def _dense_nl(q, k):
    """The reference dense math (fusion.spatial_pooling 'nl' small branch,
    minus the +t residual)."""
    energy = jnp.einsum("bnc,bmc->bnm", q, k, precision="float32",
                        preferred_element_type=jnp.float32)
    energy = (energy - energy.min()) / (energy.max() - energy.min())
    w = jax.nn.softmax(energy, axis=-1)
    return jnp.einsum("bnm,bmc->bnc", w.astype(k.dtype), k,
                      precision="float32",
                      preferred_element_type=jnp.float32)


@pytest.mark.parametrize("b,n,m,c", [
    (1, 1024, 256, 64),     # aligned everything
    (2, 1000, 70, 112),     # ragged n, m, c (masking paths)
    (1, 300, 130, 16),      # n smaller than one block
])
def test_flash_vs_dense(b, n, m, c):
    r = np.random.RandomState(7)
    q = jnp.asarray(r.rand(b, n, c) * 2 - 1, jnp.float32)
    k = jnp.asarray(r.rand(b, m, c) * 2 - 1, jnp.float32)
    want = _dense_nl(q, k)
    got = nl_spatial_flash(q, k, bn=256, mt=256, interpret=True)
    ref = float(jnp.abs(want).max())
    assert float(jnp.abs(got - want).max()) / ref < 1e-5


def test_flash_vs_blocked_bf16():
    """bf16 inputs (the full-res inference dtype): kernel vs the scanned
    XLA path within bf16 tolerance."""
    r = np.random.RandomState(3)
    q = jnp.asarray(r.rand(2, 2048, 112) * 2 - 1, jnp.bfloat16)
    k = jnp.asarray(r.rand(2, 96, 112) * 2 - 1, jnp.bfloat16)
    want = F._nl_spatial_blocked(q, k, block=512)
    got = nl_spatial_flash(q, k, bn=512, mt=256, interpret=True)
    ref = float(jnp.abs(want).max())
    assert float(jnp.abs(got.astype(jnp.float32) - want).max()) / ref < 2e-2


def test_spatial_pooling_flash_gate(monkeypatch):
    """MMIF_FLASH_NL=0 forces the XLA streaming path; the kernel (interpret)
    matches spatial_pooling's above-threshold output."""
    monkeypatch.setenv("MMIF_FLASH_NL", "0")
    r = np.random.RandomState(5)
    t = jnp.asarray(r.rand(1, 520, 520, 8), jnp.float32)  # HW > 2**18
    want = F.spatial_pooling(t, "nl")
    b, h, w, c = t.shape
    pooled = F._avg_pool8(t)
    q = t.reshape(b, h * w, c)
    k = pooled.reshape(b, -1, c)
    attn = nl_spatial_flash(q, k, bn=512, mt=512, interpret=True)
    got = attn.astype(t.dtype).reshape(b, h, w, c) + t
    assert float(jnp.abs(got - want).max()) < 1e-4


def test_flash_grad_via_blocked(monkeypatch):
    """The custom VJP (forward=kernel, backward=blocked-path recompute)
    matches grads of the blocked path itself."""
    import functools
    from multi_modal_image_fusion_tpu.ops.pallas import nl_kernel

    monkeypatch.setattr(nl_kernel, "nl_spatial_flash",
                        functools.partial(nl_kernel.nl_spatial_flash,
                                          bn=256, mt=256, interpret=True))
    r = np.random.RandomState(11)
    q = jnp.asarray(r.rand(1, 700, 48) * 2 - 1, jnp.float32)
    k = jnp.asarray(r.rand(1, 90, 48) * 2 - 1, jnp.float32)

    def loss_flash(q, k):
        return (F._nl_spatial_flash_diff(q, k) ** 2).sum()

    def loss_blocked(q, k):
        return (F._nl_spatial_blocked(q, k) ** 2).sum()

    gq, gk = jax.grad(loss_flash, argnums=(0, 1))(q, k)
    wq, wk = jax.grad(loss_blocked, argnums=(0, 1))(q, k)
    assert float(jnp.abs(gq - wq).max()) < 1e-4 * float(jnp.abs(wq).max() + 1)
    assert float(jnp.abs(gk - wk).max()) < 1e-4 * float(jnp.abs(wk).max() + 1)
