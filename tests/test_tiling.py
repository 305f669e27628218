"""Single-chip height tiling parity: parallel/tiling.py.

Same exactness claim as spatial sharding (receptive-field halo), same
tight tolerances — but sequential slabs on one device instead of a mesh.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multi_modal_image_fusion_tpu.models import create_model
from multi_modal_image_fusion_tpu.parallel.tiling import tiled_forward


def _pair(h, w, seed=0, batch=1):
    r = np.random.RandomState(seed)
    return (jnp.asarray(r.rand(batch, h, w, 1), jnp.float32),
            jnp.asarray(r.rand(batch, h, w, 1), jnp.float32))


def _init(name, img1, img2):
    model = create_model(name)
    variables = model.init(jax.random.PRNGKey(0), img1, img2, train=False)
    return model, variables


@pytest.mark.parametrize("name", ["deepfuse", "densefuse", "vifnet",
                                  "pfnetv1", "pfnetv2", "ifcnn", "difnet",
                                  "pmgi"])
def test_parity_all_eligible_models_4tiles(name):
    """4 slabs == whole-image forward, for every eligible model, at an
    odd width (exercises reflect-'SAME' width handling)."""
    img1, img2 = _pair(96, 81)
    model, variables = _init(name, img1, img2)
    want = model.apply(variables, img1, img2, train=False)
    got = tiled_forward(model, variables, img1, img2, 4)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-6, atol=1e-6)


def test_parity_2tiles_and_batch():
    """n=2 exercises the no-middle-slab case; batch > 1."""
    img1, img2 = _pair(128, 64, batch=2)
    model, variables = _init("deepfuse", img1, img2)
    want = model.apply(variables, img1, img2, train=False)
    got = tiled_forward(model, variables, img1, img2, 2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-6, atol=1e-6)


def test_parity_under_jit_many_tiles():
    """The whole tiled forward jits (lax.map interior loop) and stays
    exact at n=6 (several interior slabs)."""
    img1, img2 = _pair(144, 48)
    model, variables = _init("difnet", img1, img2)
    want = model.apply(variables, img1, img2, train=False)
    fn = jax.jit(lambda a, b: tiled_forward(model, variables, a, b, 6))
    np.testing.assert_allclose(np.asarray(fn(img1, img2)),
                               np.asarray(want), rtol=1e-6, atol=1e-6)


def test_single_tile_passthrough():
    img1, img2 = _pair(32, 32)
    model, variables = _init("deepfuse", img1, img2)
    want = model.apply(variables, img1, img2, train=False)
    got = tiled_forward(model, variables, img1, img2, 1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want))


def test_rejects_indivisible_height_and_thin_slabs():
    img1, img2 = _pair(96, 32)
    model, variables = _init("deepfuse", img1, img2)
    with pytest.raises(ValueError, match="not divisible"):
        tiled_forward(model, variables, img1, img2, 5)
    with pytest.raises(ValueError, match="receptive halo"):
        tiled_forward(model, variables, img1, img2, 48)


def test_rejects_ineligible_model():
    """ADVICE r3: ineligible models must raise loudly, not return wrong
    output. sedrfuse has cross-phase skip connections (reference
    model.py:283-292) — neither whole-model slabs nor two-phase tiling
    apply."""
    img1, img2 = _pair(64, 32)
    model, variables = _init("sedrfuse", img1, img2)
    with pytest.raises(ValueError, match="height-shard"):
        tiled_forward(model, variables, img1, img2, 2)


# --- two-phase multi-scale tiling (VERDICT r3 item #2) ---------------------

@pytest.mark.parametrize("name", ["nestfuse", "rfnnest", "mafusion",
                                  "unfusion", "res2fusion"])
def test_multiscale_parity_4tiles(name):
    """Two-phase tiled forward == whole-image forward for the multi-scale
    / global-fusion heavy tail (global sca/wavg/nl fusion statistics,
    bilinear align_corners decoders)."""
    # unfusion's dense encoder grid has the deepest receptive halo (48
    # rows): slabs must be at least that tall
    img1, img2 = _pair(192 if name == "unfusion" else 128, 80)
    model, variables = _init(name, img1, img2)
    want = model.apply(variables, img1, img2, train=False)
    got = tiled_forward(model, variables, img1, img2, 4)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("name", ["nestfuse", "mafusion"])
def test_multiscale_parity_odd_width_2tiles(name):
    """Odd width exercises the reflect pad_to shape-repair at every scale
    (81 -> 41 -> 21 -> 11) inside slab runs; n=2 has no interior slabs."""
    img1, img2 = _pair(144, 81)
    model, variables = _init(name, img1, img2)
    want = model.apply(variables, img1, img2, train=False)
    got = tiled_forward(model, variables, img1, img2, 2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-6)


def test_multiscale_parity_under_jit_batch():
    """Jitted end-to-end, batch > 1, several interior slabs (lax.map with
    traced slab offsets through the bilinear tile context)."""
    img1, img2 = _pair(192, 48, batch=2)
    model, variables = _init("mafusion", img1, img2)
    want = model.apply(variables, img1, img2, train=False)
    fn = jax.jit(lambda a, b: tiled_forward(model, variables, a, b, 6))
    np.testing.assert_allclose(np.asarray(fn(img1, img2)),
                               np.asarray(want), rtol=1e-5, atol=1e-6)


def test_multiscale_rejects_misaligned_slabs():
    img1, img2 = _pair(120, 48)  # slab 30 at n=4: not a multiple of 8
    model, variables = _init("nestfuse", img1, img2)
    with pytest.raises(ValueError, match="multiples of 8"):
        tiled_forward(model, variables, img1, img2, 4)
