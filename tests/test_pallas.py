"""Pallas kernel parity tests (interpreter mode on CPU; the compiled path is
exercised on real TPU by the CLIs/bench)."""

import jax.numpy as jnp
import numpy as np
import pytest

from multi_modal_image_fusion_tpu.ops.pallas.ssim_kernel import \
    ssim_maps_pallas
from multi_modal_image_fusion_tpu.ops.ssim import (default_sigma,
                                                   gaussian_kernel,
                                                   ssim_maps)


@pytest.mark.parametrize("use_padding", [False, True])
@pytest.mark.parametrize("shape", [(1, 64, 64), (2, 300, 257)])
def test_fused_ssim_kernel_parity(use_padding, shape):
    n, h, w = shape
    r = np.random.RandomState(0)
    x1 = jnp.asarray(r.rand(n, h, w, 1), jnp.float32)
    x2 = jnp.asarray(r.rand(n, h, w, 1), jnp.float32)
    k1d = gaussian_kernel(11, default_sigma(11))
    want = ssim_maps(x1, x2, k1d, 1.0, use_padding)
    got = ssim_maps_pallas(x1, x2, 11, 1.0, use_padding, interpret=True)
    for a, b in zip(got, want):
        assert a.shape == b.shape
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_fused_ssim_kernel_metric_sigma():
    """The metric-side SSIM always uses sigma=1.5 (reference
    metric.py:299)."""
    r = np.random.RandomState(1)
    x1 = jnp.asarray(r.rand(1, 128, 128, 1) * 255, jnp.float32)
    x2 = jnp.asarray(r.rand(1, 128, 128, 1) * 255, jnp.float32)
    k1d = gaussian_kernel(11, 1.5)
    want = ssim_maps(x1, x2, k1d, 255.0, False)
    got = ssim_maps_pallas(x1, x2, 11, 255.0, False, sigma=1.5,
                           interpret=True)
    np.testing.assert_allclose(float(got[0].mean()), float(want[0].mean()),
                               atol=1e-5)


@pytest.mark.parametrize("k,cin,cout", [(3, 32, 32), (5, 16, 32),
                                        (7, 32, 16)])
def test_shifted_gemm_conv_parity(k, cin, cout):
    import jax

    from pallas_archive import \
        conv_shifted_gemm

    r = np.random.RandomState(0)
    h, w = 27, 150
    x = jnp.asarray(r.rand(2, h + k - 1, w + k - 1, cin), jnp.float32)
    wgt = jnp.asarray(r.rand(k, k, cin, cout) - 0.5, jnp.float32)
    want = jax.lax.conv_general_dilated(
        x, wgt, (1, 1), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"))
    got = conv_shifted_gemm(x, wgt, k, interpret=True)
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4)


def test_fast_inference_context_routes_convs():
    """fast_inference() only flips behavior on TPU; on CPU it must be a
    no-op and outputs stay identical."""
    import jax

    from multi_modal_image_fusion_tpu.models import create_model
    from multi_modal_image_fusion_tpu.ops.layers import fast_inference

    model = create_model("deepfuse")
    x = jnp.asarray(np.random.RandomState(0).rand(1, 32, 32, 1),
                    jnp.float32)
    v = model.init(jax.random.PRNGKey(0), x, x, train=False)
    y1 = model.apply(v, x, x, train=False)
    with fast_inference():
        y2 = model.apply(v, x, x, train=False)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), atol=1e-6)


def test_moments_kernel_parity():
    from multi_modal_image_fusion_tpu.ops.pallas.moments_kernel import \
        moments_pallas
    from multi_modal_image_fusion_tpu.ops.ssim import gaussian_filter

    r = np.random.RandomState(0)
    x1 = jnp.asarray(r.rand(1, 200, 180, 1), jnp.float32)
    x2 = jnp.asarray(r.rand(1, 200, 180, 1), jnp.float32)
    ws = 9
    k1d = gaussian_kernel(ws, ws / 5)
    want = (gaussian_filter(x1, k1d), gaussian_filter(x2, k1d),
            gaussian_filter(x1 * x1, k1d), gaussian_filter(x2 * x2, k1d),
            gaussian_filter(x1 * x2, k1d))
    got = moments_pallas(x1, x2, ws, ws / 5, interpret=True)
    for g, w in zip(got, want):
        assert g.shape == w.shape
        np.testing.assert_allclose(np.asarray(g), np.asarray(w), atol=1e-5)


def test_tlane_conv_parity():
    import jax

    from pallas_archive import \
        conv_shifted_gemm_tlane

    r = np.random.RandomState(0)
    k = 7
    x = jnp.asarray(r.rand(2, 46, 306, 32), jnp.float32)
    wgt = jnp.asarray(r.rand(k, k, 32, 32) - 0.5, jnp.float32)
    want = jax.lax.conv_general_dilated(
        x, wgt, (1, 1), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"))
    got = conv_shifted_gemm_tlane(x, wgt, k, rows=16, wtile=64,
                                  interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4)


def test_ilane_conv_parity():
    import jax

    from pallas_archive import \
        conv_shifted_gemm_ilane

    r = np.random.RandomState(0)
    k = 7
    x = jnp.asarray(r.rand(2, 46, 306, 32), jnp.float32)
    wgt = jnp.asarray(r.rand(k, k, 32, 32) - 0.5, jnp.float32)
    want = jax.lax.conv_general_dilated(
        x, wgt, (1, 1), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"))
    got = conv_shifted_gemm_ilane(x, wgt, k, rows=16, wtile=64, kw_chunk=4,
                                  interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4)


def test_tlane_dma_conv_parity_fused_epilogue():
    """The production DMA kernel with the bias+act staging epilogue
    (small shape: interpret mode simulates the strip DMA loop)."""
    import jax

    from multi_modal_image_fusion_tpu.ops.pallas.conv_kernel import \
        conv_tlane_dma

    r = np.random.RandomState(0)
    k = 5
    x = jnp.asarray(r.rand(1, 16 + k - 1, 40 + k - 1, 8), jnp.float32)
    wgt = jnp.asarray(r.rand(k, k, 8, 8) - 0.5, jnp.float32)
    bias = jnp.asarray(r.rand(8) - 0.5, jnp.float32)
    want = jax.lax.conv_general_dilated(
        x, wgt, (1, 1), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"))

    got = conv_tlane_dma(x, wgt, k, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)

    got = conv_tlane_dma(x, wgt, k, bias=bias, act="relu6", interpret=True)
    want_ba = jnp.clip(want + bias, 0.0, 6.0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want_ba),
                               atol=1e-5)


def test_chain_conv_parity():
    """Guard-layout chain conv (NCHW-resident pipeline): reflect-SAME
    semantics via guard-band halos, multi-layer chaining, and elementwise
    fusion mid-chain — vs reflect-padded XLA convs."""
    import jax

    from multi_modal_image_fusion_tpu.ops.pallas.conv_kernel import (
        chain_enter, chain_exit, chain_refresh_halo, conv_tlane_chain)

    r = np.random.RandomState(1)
    h, w = 20, 40

    def ref_conv(x, wgt, k, act=True):
        p = k // 2
        xp = jnp.pad(x, ((0, 0), (p, p), (p, p), (0, 0)), mode="reflect")
        y = jax.lax.conv_general_dilated(
            xp, wgt, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return jnp.maximum(y, 0.0) if act else y

    # single layers across k/channel configs (incl. c_in=1 stem)
    for k, cin, cout in [(5, 1, 8), (7, 8, 16), (3, 16, 8)]:
        x = jnp.asarray(r.rand(2, h, w, cin), jnp.float32)
        wgt = jnp.asarray(r.rand(k, k, cin, cout) - 0.5, jnp.float32)
        bias = jnp.asarray(r.rand(cout) - 0.5, jnp.float32)
        want = jnp.clip(ref_conv(x, wgt, k, act=False) + bias, 0.0, 6.0)
        xt = chain_refresh_halo(chain_enter(x), h, w, k // 2)
        got = chain_exit(conv_tlane_chain(xt, wgt, k, h=h, w_valid=w,
                                          bias=bias, act="relu6",
                                          interpret=True), h, w)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-5)

    # 2-layer chain with elementwise-sum fusion in the middle (the
    # _FusionModel fast-path shape: enc -> sum -> dec)
    x1 = jnp.asarray(r.rand(1, h, w, 1), jnp.float32)
    x2 = jnp.asarray(r.rand(1, h, w, 1), jnp.float32)
    w1 = jnp.asarray(r.rand(5, 5, 1, 8) - 0.5, jnp.float32)
    w2 = jnp.asarray(r.rand(7, 7, 8, 4) - 0.5, jnp.float32)
    want = ref_conv(ref_conv(x1, w1, 5) + ref_conv(x2, w1, 5), w2, 7)

    def enc(x):
        t = chain_refresh_halo(chain_enter(x), h, w, 2)
        return conv_tlane_chain(t, w1, 5, h=h, w_valid=w, act="relu",
                                interpret=True)

    s = chain_refresh_halo(enc(x1) + enc(x2), h, w, 3)
    got = chain_exit(conv_tlane_chain(s, w2, 7, h=h, w_valid=w, act="relu",
                                      interpret=True), h, w)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_chain_enter_exit_gray_kernels():
    """Pallas grayscale enter/exit strip-copy kernels vs the XLA
    place/crop path: valid region identical (guards are deliberately
    uninitialized in the kernel — compare the valid window only), and
    exit(enter(x)) is the identity."""
    from multi_modal_image_fusion_tpu.ops.pallas.conv_kernel import (
        CHAIN_GUARD, CHAIN_WG, _chain_enter_gray, _chain_exit_gray,
        chain_shape)

    r = np.random.RandomState(7)
    h, w = 136, 128          # aligned (h % 8 == 0, w % 128 == 0), tail chunk
    x = jnp.asarray(r.rand(3, h, w, 1) - 0.5, jnp.float32)
    got = _chain_enter_gray(x, interpret=True)
    hg, wp = chain_shape(h, w)
    assert got.shape == (3, 1, hg, wp)
    valid = got[:, :, CHAIN_GUARD:CHAIN_GUARD + h, CHAIN_WG:CHAIN_WG + w]
    np.testing.assert_array_equal(
        np.asarray(valid[:, 0, :, :, None]), np.asarray(x))
    back = _chain_exit_gray(got, h, w, interpret=True)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(x))


@pytest.mark.parametrize("budget", ["1000000", "500000"])
def test_chain_conv_channel_chunked_wide_layer(monkeypatch, budget):
    """Wide-concat chain convs over the scoped-vmem budget: 2-way c_in
    chunking (partial convs summed before bias+act) when the halves fit
    (budget=1000000 on DenseFuse's c_in=64 layers), else the XLA-conv
    fallback on the halo-refreshed guard tensor (budget=500000). Both
    forced via the budget override; must match the unchunked fast path."""
    import jax

    from multi_modal_image_fusion_tpu.models import create_model
    from multi_modal_image_fusion_tpu.ops.layers import fast_inference

    monkeypatch.setenv("MMIF_CHAIN_INTERPRET", "1")
    r = np.random.RandomState(0)
    model = create_model("densefuse")   # dense concat encoder: c_in 64
    x1 = jnp.asarray(r.rand(1, 30, 44, 1), jnp.float32)
    x2 = jnp.asarray(r.rand(1, 30, 44, 1), jnp.float32)
    v = model.init(jax.random.PRNGKey(0), x1, x2, train=False)
    want = model.apply(v, x1, x2, train=False)
    monkeypatch.setenv("MMIF_CHAIN_VMEM_BUDGET", budget)
    with fast_inference():
        got = model.apply(v, x1, x2, train=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_chain_conv_ssa_epilogue_parity():
    """'ssa' kw epilogue (roll-sum fused into staging, no acc_ref): valid
    region bit-matches the 'acc' epilogue, including chained layers with
    in-kernel halos — the roll wrap-around lanes land only in guard/
    never-read zones and are overwritten by the next layer's mirrors."""
    import jax

    from multi_modal_image_fusion_tpu.ops.pallas.conv_kernel import (
        chain_enter, chain_exit, conv_tlane_chain)

    r = np.random.RandomState(3)
    h, w = 45, 61
    x1 = jnp.asarray(r.rand(2, h, w, 1) - 0.5, jnp.float32)
    x2 = jnp.asarray(r.rand(2, h, w, 1) - 0.5, jnp.float32)
    w1 = jnp.asarray(r.rand(5, 5, 1, 8) - 0.5, jnp.float32)
    w2 = jnp.asarray(r.rand(7, 7, 8, 6) - 0.5, jnp.float32)
    w3 = jnp.asarray(r.rand(3, 3, 6, 1) - 0.5, jnp.float32)
    b2 = jnp.asarray(r.rand(6) - 0.5, jnp.float32)

    def fwd(epi):
        # siamese enc -> fused (fuse_n) dec -> tail: all three kernel modes
        xt = jnp.concatenate([chain_enter(x1), chain_enter(x2)], axis=0)
        t = conv_tlane_chain(xt, w1, 5, h=h, w_valid=w, act="relu",
                             halo=True, epilogue=epi, interpret=True)
        t = conv_tlane_chain(t, w2, 7, h=h, w_valid=w, bias=b2, act="lrelu",
                             halo=True, fuse_n=2, epilogue=epi,
                             interpret=True)
        t = conv_tlane_chain(t, w3, 3, h=h, w_valid=w, act="tanh",
                             halo=True, epilogue=epi, interpret=True)
        return chain_exit(t, h, w)

    np.testing.assert_allclose(np.asarray(fwd("ssa")),
                               np.asarray(fwd("acc")), atol=1e-6)


@pytest.mark.parametrize("name", ["deepfuse", "densefuse", "vifnet",
                                  "pfnetv1", "ifcnn", "difnet",
                                  "pfnetv2",
                                  # multi-scale (round 3): guard-layout
                                  # scale transitions via chain_ops
                                  "nestfuse", "rfnnest", "mafusion",
                                  "unfusion", "pmgi", "dbnet",
                                  "res2fusion"])
def test_model_chain_fast_path_parity(name, monkeypatch):
    """Full-model guard-layout fast path (MMIF_CHAIN_INTERPRET forces the
    chain kernels in interpret mode on CPU) vs the normal forward."""
    import jax

    from multi_modal_image_fusion_tpu.models import create_model
    from multi_modal_image_fusion_tpu.ops.layers import fast_inference

    monkeypatch.setenv("MMIF_CHAIN_INTERPRET", "1")
    r = np.random.RandomState(0)
    model = create_model(name)
    x1 = jnp.asarray(r.rand(1, 30, 44, 1), jnp.float32)
    x2 = jnp.asarray(r.rand(1, 30, 44, 1), jnp.float32)
    v = model.init(jax.random.PRNGKey(0), x1, x2, train=True)
    if "batch_stats" in v:
        # perturb BN stats off identity so eval-mode BN folding is tested
        v = dict(v)
        v["batch_stats"] = jax.tree.map(
            lambda a: a + 0.3 * jnp.arange(a.size, dtype=a.dtype
                                           ).reshape(a.shape) / a.size,
            v["batch_stats"])
    want = model.apply(v, x1, x2, train=False)
    with fast_inference():
        got = model.apply(v, x1, x2, train=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5)


@pytest.mark.parametrize("fusion_mode", ["sum", "mean"])
def test_deepfuse_s2d_chain_parity(fusion_mode, monkeypatch):
    """Space-to-depth packed chain (MMIF_S2D=1): DeepFuse's whole forward
    on f=2 packed tensors — packed weights (ops/s2d.py), per-phase
    in-kernel halo mirrors (conv_kernel._mirror s2d patches) — must match
    the normal forward to f32 rounding. Covers both the fuse_n-folded
    'sum' fusion and the explicit elementwise path."""
    import jax

    from multi_modal_image_fusion_tpu.models import create_model
    from multi_modal_image_fusion_tpu.ops.layers import fast_inference

    monkeypatch.setenv("MMIF_CHAIN_INTERPRET", "1")
    monkeypatch.setenv("MMIF_S2D", "1")
    r = np.random.RandomState(3)
    model = create_model("deepfuse", fusion_mode=fusion_mode)
    # even H/W (s2d eligibility), odd packed height exercises the
    # bottom-strip mirror geometry (15 rows -> h8=16 with a partial strip)
    x1 = jnp.asarray(r.rand(2, 30, 44, 1), jnp.float32)
    x2 = jnp.asarray(r.rand(2, 30, 44, 1), jnp.float32)
    v = model.init(jax.random.PRNGKey(0), x1, x2, train=False)
    want = model.apply(v, x1, x2, train=False)
    with fast_inference():
        got = model.apply(v, x1, x2, train=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5)


def test_chain_pair_fused_conv_parity():
    """Fused two-conv strip kernel (conv_tlane_chain_pair, round-3
    rewrite): reflect-SAME composition with the intermediate
    VMEM-resident; BOTH halos (input pa + mid pb) are mirrored in-kernel
    — no chain_refresh_halo prepass — with ssai interior-slice
    epilogues."""
    import jax

    from multi_modal_image_fusion_tpu.ops.pallas.conv_kernel import (
        chain_enter, chain_exit, conv_tlane_chain_pair)

    r = np.random.RandomState(2)

    def ref_conv(x, wgt, k, bias, act):
        p = k // 2
        xp = (jnp.pad(x, ((0, 0), (p, p), (p, p), (0, 0)), mode="reflect")
              if p else x)
        y = jax.lax.conv_general_dilated(
            xp, wgt, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC")) + bias
        return jnp.maximum(y, 0.0) if act else y

    for (h, w, cin, cmid, cout, ka, kb) in [(24, 40, 8, 16, 1, 5, 5),
                                            (30, 44, 4, 8, 4, 7, 3)]:
        x = jnp.asarray(r.rand(2, h, w, cin), jnp.float32)
        wa = jnp.asarray(r.rand(ka, ka, cin, cmid) - 0.5, jnp.float32)
        wb = jnp.asarray(r.rand(kb, kb, cmid, cout) - 0.5, jnp.float32)
        ba = jnp.asarray(r.rand(cmid) - 0.5, jnp.float32)
        bb = jnp.asarray(r.rand(cout) - 0.5, jnp.float32)
        want = ref_conv(ref_conv(x, wa, ka, ba, True), wb, kb, bb, False)
        xt = chain_enter(x)
        yt = conv_tlane_chain_pair(xt, wa, wb, ka, kb, h=h, w_valid=w,
                                   bias_a=ba, act_a="relu", bias_b=bb,
                                   act_b=None, rows=16, interpret=True)
        np.testing.assert_allclose(np.asarray(chain_exit(yt, h, w)),
                                   np.asarray(want), atol=5e-5)


def test_chain_ops_scale_transitions():
    """chain_max_pool / chain_upsample / chain_resize vs their NHWC
    equivalents (max_pool, interpolate+pad_to) on odd sizes."""
    import jax

    from multi_modal_image_fusion_tpu.ops.blocks import pad_to
    from multi_modal_image_fusion_tpu.ops.layers import (interpolate,
                                                         max_pool)
    from multi_modal_image_fusion_tpu.ops.pallas.chain_ops import (
        chain_max_pool, chain_resize, chain_upsample, chain_valid)
    from multi_modal_image_fusion_tpu.ops.pallas.conv_kernel import \
        chain_enter

    r = np.random.RandomState(0)
    h, w = 45, 61
    x = jnp.asarray(r.rand(2, h, w, 6), jnp.float32)
    t = chain_enter(x)

    # maxpool 2 down (floor), no repair
    got, (h2, w2) = chain_max_pool(t, h, w, 2)
    want = max_pool(x, 2, 2)
    assert (h2, w2) == (want.shape[1], want.shape[2])
    np.testing.assert_allclose(
        np.asarray(chain_valid(got, h2, w2)),
        np.asarray(jnp.transpose(want, (0, 3, 1, 2))), atol=1e-6)

    # maxpool 4 down with pad-to repair to an 'off' target
    got4, hw4 = chain_max_pool(t, h, w, 4, to_hw=(12, 16))
    want4 = pad_to(max_pool(x, 4, 4), (12, 16))
    assert hw4 == (12, 16)
    np.testing.assert_allclose(
        np.asarray(chain_valid(got4, 12, 16)),
        np.asarray(jnp.transpose(want4, (0, 3, 1, 2))), atol=1e-6)

    # upsample x2 (nearest + bilinear) with repair to the original size
    down, (hd, wd) = chain_max_pool(t, h, w, 2)
    for mode in ("nearest", "bilinear"):
        up, hwu = chain_upsample(down, hd, wd, (h, w), 2, mode)
        want_up = pad_to(interpolate(max_pool(x, 2, 2), 2, mode), (h, w))
        np.testing.assert_allclose(
            np.asarray(chain_valid(up, h, w)),
            np.asarray(jnp.transpose(want_up, (0, 3, 1, 2))), atol=1e-5)

    # same-scale resize repair (crop + reflect)
    rs, _ = chain_resize(t, h, w, (h - 3, w + 5))
    want_rs = pad_to(x, (h - 3, w + 5))
    np.testing.assert_allclose(
        np.asarray(chain_valid(rs, h - 3, w + 5)),
        np.asarray(jnp.transpose(want_rs, (0, 3, 1, 2))), atol=1e-6)
