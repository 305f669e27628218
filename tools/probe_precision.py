"""Round-5 probe: is the multi-leg 'f32 parity failure' (2.9-4.7e-3,
r4_queue_results.log queue 14) a kernel bug or MXU default-precision
noise?

On TPU, jax.lax.dot_general with precision=None multiplies in bf16 even
for f32 operands (the classic XLA default-precision gotcha); Pallas/Mosaic
inherits that. If both chain kernels carry ~1e-3 bf16 noise with different
reduction orders, an f32 A-vs-B maxdiff of 2.9e-3 is EXPECTED, not a bug.

Measures, for one conv shape (deepfuse enc1-ish, k7 16->32) at f32:
  - xla HIGHEST (exact f32 reference)
  - xla DEFAULT
  - conv_hiw_chain (single-leg H-major)
  - conv_hiw_chain_multi (two 8-ch legs == the 16-ch conv)
  - C-major chain conv (the production path the probe compared against)
each vs the exact reference, rel maxdiff.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/probe_precision.py
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from multi_modal_image_fusion_tpu.ops.pallas.hiw_kernel import (
        conv_hiw_chain, conv_hiw_chain_multi, hiw_enter)
    from multi_modal_image_fusion_tpu.ops.pallas.conv_kernel import (
        CHAIN_GUARD, CHAIN_WG, chain_shape)

    k, c_in, c_out, h, w = 7, 16, 32, 256, 256
    r = np.random.RandomState(0)
    x = jnp.asarray(r.rand(2, h, w, c_in) - 0.5, jnp.float32)
    wgt = jnp.asarray(r.rand(k, k, c_in, c_out) - 0.5, jnp.float32)
    p = k // 2
    xp = jnp.pad(x, ((0, 0), (p, p), (p, p), (0, 0)), "reflect")

    def xla(prec):
        return jax.lax.conv_general_dilated(
            xp, wgt, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            precision=prec)

    ref = np.asarray(xla(jax.lax.Precision.HIGHEST), np.float64)
    scale = np.abs(ref).max()

    def rel(y):
        return float(np.abs(np.asarray(y, np.float64) - ref).max() / scale)

    out = {"probe": "precision", "shape": f"{c_in}-{c_out}-{k}"}
    out["xla_default"] = rel(xla(None))

    # H-major tensors
    hg, wp = chain_shape(h, w)
    def to_hm(xx, c):
        b = xx.shape[0]
        t = jnp.zeros((b, hg, c, wp), xx.dtype)
        t = jax.lax.dynamic_update_slice(
            t, jnp.transpose(xx, (0, 1, 3, 2)), (0, CHAIN_GUARD, 0, CHAIN_WG))
        return t.reshape(b, hg * c, wp)

    def from_hm(t, c):
        b, hgc, wpp = t.shape
        t = t.reshape(b, hgc // c, c, wpp)
        sl = t[:, CHAIN_GUARD:CHAIN_GUARD + h, :, CHAIN_WG:CHAIN_WG + w]
        return jnp.transpose(sl, (0, 1, 3, 2))

    t = to_hm(x, c_in)
    y = conv_hiw_chain(t, wgt, k, h=h, w_valid=w, c_in=c_in)
    out["hiw_single"] = rel(from_hm(y, c_out))

    t0 = to_hm(x[..., :8], 8)
    t1 = to_hm(x[..., 8:], 8)
    y = conv_hiw_chain_multi((t0, t1), wgt, k, h=h, w_valid=w,
                             c_ins=(8, 8), b_offs=(0, 0), n_out=2)
    out["hiw_multi"] = rel(from_hm(y, c_out))

    # C-major production chain conv (4D guard layout, in-kernel halo)
    try:
        from multi_modal_image_fusion_tpu.ops.pallas import conv_kernel as ck
        tcm = jnp.zeros((2, c_in, hg, wp), x.dtype)
        tcm = jax.lax.dynamic_update_slice(
            tcm, jnp.transpose(x, (0, 3, 1, 2)), (0, 0, CHAIN_GUARD, CHAIN_WG))
        yc = ck.conv_tlane_chain(tcm, wgt, k, h=h, w_valid=w, halo=True)
        yc = yc[:, :, CHAIN_GUARD:CHAIN_GUARD + h, CHAIN_WG:CHAIN_WG + w]
        out["cmajor"] = rel(jnp.transpose(yc, (0, 2, 3, 1)))
    except Exception as e:
        out["cmajor_error"] = str(e).splitlines()[0][:120]

    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
