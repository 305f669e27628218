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
