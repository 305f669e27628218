"""Model-zoo tests: every model builds, runs forward at fusion + autoencoder
modes, handles odd input sizes, and matches the reference's parameter count
exactly (tests/golden/param_counts.json, generated from the torch
reference)."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multi_modal_image_fusion_tpu.models import MODEL_ZOO, MyFusion, \
    create_model

PARAM_COUNTS = json.load(
    open(os.path.join(os.path.dirname(__file__), "golden",
                      "param_counts.json")))

NAME_MAP = {
    "deepfuse": "DeepFuse", "densefuse": "DenseFuse", "vifnet": "VIFNet",
    "dbnet": "DBNet", "sedrfuse": "SEDRFuse", "nestfuse": "NestFuse",
    "rfnnest": "RFNNest", "unfusion": "UNFusion", "res2fusion": "Res2Fusion",
    "mafusion": "MAFusion", "ifcnn": "IFCNN", "difnet": "DIFNet",
    "pmgi": "PMGI", "pfnetv1": "PFNetv1", "pfnetv2": "PFNetv2",
    "myfusion": "MyFusion",
}

# models whose reference default constructor the zoo reproduces exactly
ALL = sorted(MODEL_ZOO)

TWO_INPUT_ONLY = {"pfnetv1", "pmgi", "myfusion"}
# concat-fusion models: the decoder consumes 2x encoder channels, so the
# one-input AE path is structurally impossible (crashes identically in the
# reference: VIFNet decode expects 128ch, model.py:197-206)
NO_AE = TWO_INPUT_ONLY | {"vifnet"}


def param_count(params):
    return sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))


def init_model(model, shape=(1, 32, 32, 1)):
    x = jnp.zeros(shape, jnp.float32)
    return model.init(jax.random.PRNGKey(0), x, x, train=False)


@pytest.mark.parametrize("name", ALL)
def test_param_count_matches_reference(name):
    model = create_model(name)
    variables = init_model(model)
    got = param_count(variables["params"])
    want = PARAM_COUNTS[NAME_MAP[name]]
    assert got == want, f"{name}: {got} != reference {want}"


@pytest.mark.parametrize("name", ALL)
def test_forward_shapes(name):
    model = create_model(name)
    # random inputs: constant images make min-max-normalized attention
    # (fusion 'nl' modes) divide by zero, in the reference too
    x1 = jax.random.uniform(jax.random.PRNGKey(3), (2, 64, 64, 1))
    x2 = jax.random.uniform(jax.random.PRNGKey(4), (2, 64, 64, 1))
    variables = model.init(jax.random.PRNGKey(0), x1, x2, train=False)
    y = model.apply(variables, x1, x2, train=False)
    assert y.shape == (2, 64, 64, 1)
    assert np.isfinite(np.asarray(y)).all()


@pytest.mark.parametrize("name", sorted(set(ALL) - NO_AE))
def test_autoencoder_mode(name):
    model = create_model(name)
    x1 = jnp.ones((1, 32, 32, 1), jnp.float32) * 0.5
    variables = model.init(jax.random.PRNGKey(0), x1, x1, train=False)
    y = model.apply(variables, x1, train=False)
    assert y.shape == (1, 32, 32, 1)


@pytest.mark.parametrize("name,size", [
    ("nestfuse", (45, 57)), ("unfusion", (45, 57)), ("mafusion", (45, 57)),
    ("dbnet", (45, 57)), ("myfusion", (45, 57)),
    # SEDRFuse's transpose-conv decoder requires multiples of 4 (as in the
    # reference: deconv output 2x the stride-2-floored size must match the
    # skip feature), so it gets the non-multiple-of-8 case instead
    ("sedrfuse", (44, 52)),
])
def test_odd_input_sizes(name, size):
    """The shape-repair paths (reflect pad/crop after up/down sampling)
    must handle non-multiple-of-8 inputs (reference block.py:941-991)."""
    model = create_model(name)
    h, w = size
    x1 = jax.random.uniform(jax.random.PRNGKey(3), (1, h, w, 1))
    x2 = jax.random.uniform(jax.random.PRNGKey(4), (1, h, w, 1))
    variables = model.init(jax.random.PRNGKey(0), x1, x2, train=False)
    y = model.apply(variables, x1, x2, train=False)
    assert y.shape == (1, h, w, 1)


def test_siamese_weight_sharing():
    """Swapping inputs of a shared-encoder model with a symmetric fusion
    (DeepFuse sum) must give the identical output."""
    model = create_model("deepfuse")
    k = jax.random.PRNGKey(1)
    x1 = jax.random.uniform(k, (1, 32, 32, 1))
    x2 = jax.random.uniform(jax.random.PRNGKey(2), (1, 32, 32, 1))
    variables = model.init(jax.random.PRNGKey(0), x1, x2, train=False)
    y12 = model.apply(variables, x1, x2, train=False)
    y21 = model.apply(variables, x2, x1, train=False)
    np.testing.assert_allclose(np.asarray(y12), np.asarray(y21), atol=1e-6)


@pytest.mark.parametrize("swl", [0, 2, 4])
def test_myfusion_share_levels(swl):
    model = MyFusion(share_weight_levels=swl)
    x = jnp.ones((1, 32, 32, 1), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, x, train=False)
    y = model.apply(variables, x, x, train=False)
    assert y.shape == (1, 32, 32, 1)


@pytest.mark.parametrize("encoder", ["sep", "mix", "res2", "conv_former",
                                     "transformer"])
@pytest.mark.parametrize("decoder", ["plain", "ls", "nest", "fs"])
def test_myfusion_design_space(encoder, decoder):
    model = MyFusion(encoder=encoder, decoder=decoder, fusion_method="elem",
                     fusion_mode="sum")
    x = jnp.ones((1, 32, 32, 1), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, x, train=False)
    y = model.apply(variables, x, x, train=False)
    assert y.shape == (1, 32, 32, 1)


@pytest.mark.parametrize("method,mode", [("elem", "max"), ("attn", "wavg"),
                                         ("concat", "sum"), ("rfn", "sum")])
def test_myfusion_fusion_methods(method, mode):
    model = MyFusion(fusion_method=method, fusion_mode=mode)
    x = jnp.ones((1, 32, 32, 1), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, x, train=False)
    y = model.apply(variables, x, x, train=False)
    assert y.shape == (1, 32, 32, 1)
