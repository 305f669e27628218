"""Serving export: jax.export serialization roundtrip (cli/export.py).

The reference has no export path (deployment = re-run test.py with torch
installed, reference test.py:41-61); this is the TPU-native serving
story — a versioned StableHLO artifact reloadable without the package.
"""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from multi_modal_image_fusion_tpu.cli.export import (export_model, main,
                                                     verify_roundtrip)
from multi_modal_image_fusion_tpu.models import create_model


def _init(name, h=32, w=32):
    model = create_model(name)
    x = jnp.zeros((1, h, w, 1), jnp.float32)
    return model, model.init(jax.random.PRNGKey(0), x, x, train=False)


def test_export_roundtrip_exact():
    model, variables = _init("densefuse")
    exported = export_model(model, variables, batch=2, height=32, width=32)
    blob = exported.serialize()
    assert len(blob) > 1000
    dev = verify_roundtrip(blob, model, variables, 2, 32, 32)
    assert dev <= 1e-6, dev


def test_export_symbolic_batch_serves_any_batch():
    model, variables = _init("densefuse")
    exported = export_model(model, variables, batch=1, height=32, width=32,
                            symbolic_batch=True)
    blob = exported.serialize()
    from jax import export as jexport
    fn = jexport.deserialize(blob)
    r = np.random.RandomState(0)
    for b in (1, 3):
        x1 = jnp.asarray(r.rand(b, 32, 32, 1), jnp.float32)
        x2 = jnp.asarray(r.rand(b, 32, 32, 1), jnp.float32)
        got = fn.call(x1, x2)
        want = model.apply(variables, x1, x2, train=False)
        np.testing.assert_allclose(np.asarray(got, np.float32),
                                   np.asarray(want, np.float32), atol=1e-6)


def test_export_cli_random_init(tmp_path):
    out = str(tmp_path / "m.mmifx")
    path = main(["--model", "densefuse", "--height", "32", "--width", "32",
                 "--batch", "1", "--out", out])
    assert path == out and os.path.isfile(out)
    sidecar = json.load(open(out + ".json"))
    assert sidecar["model"] == "densefuse"
    assert sidecar["batch"] == 1 and sidecar["height"] == 32
    assert sidecar["params_m"] > 0


def test_export_cli_from_checkpoint(tmp_path):
    # train a 1-epoch densefuse on a synthetic set, then export from the
    # checkpoint and check the artifact reproduces cli-test inference
    from multi_modal_image_fusion_tpu.cli import train as train_cli
    from multi_modal_image_fusion_tpu.data.io import imwrite

    root = tmp_path / "datasets" / "tiny"
    rng = np.random.RandomState(0)
    for split, n in (("train", 4), ("test", 2)):
        for mod in ("vis", "ir"):
            os.makedirs(root / split / mod)
        for i in range(n):
            img = (rng.rand(128, 128) * 255).astype(np.uint8)
            imwrite(str(root / split / "vis" / f"{i + 1}.png"), img)
            imwrite(str(root / split / "ir" / f"{i + 1}.png"), 255 - img)

    ckpt_root = str(tmp_path / "checkpoints")
    ckpt_dir = train_cli.main([
        "--data", "tiny", "--data_root", str(tmp_path / "datasets"),
        "--ckpt_root", ckpt_root, "--model", "densefuse",
        "--bs", "4", "--epoch", "1"])

    out = str(tmp_path / "trained.mmifx")
    main(["--ckpt", os.path.basename(ckpt_dir), "--ckpt_root", ckpt_root,
          "--height", "64", "--width", "64", "--out", out])
    sidecar = json.load(open(out + ".json"))
    assert sidecar["model"] == "densefuse"


def test_export_sharded_serving():
    """Multi-chip serving: export a batch-sharded fused forward over a
    device mesh and roundtrip it — the deserialized artifact executes
    under the same mesh with sharded inputs (serving-scale inference,
    no analogue in the reference's single-GPU test.py)."""
    from jax import export as jexport
    from jax.sharding import NamedSharding, PartitionSpec as P

    from multi_modal_image_fusion_tpu.parallel.mesh import make_mesh

    model, variables = _init("densefuse")
    mesh = make_mesh(jax.devices()[:8])
    shard = NamedSharding(mesh, P("data"))

    def fuse(img1, img2):
        return model.apply(variables, img1, img2, train=False)

    spec = jax.ShapeDtypeStruct((8, 32, 32, 1), jnp.float32, sharding=shard)
    exported = jexport.export(
        jax.jit(fuse, in_shardings=(shard, shard), out_shardings=shard))(
            spec, spec)
    fn = jexport.deserialize(exported.serialize())

    r = np.random.RandomState(0)
    x1 = jax.device_put(jnp.asarray(r.rand(8, 32, 32, 1), jnp.float32),
                        shard)
    x2 = jax.device_put(jnp.asarray(r.rand(8, 32, 32, 1), jnp.float32),
                        shard)
    got = fn.call(x1, x2)
    want = fuse(x1, x2)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32), atol=1e-6)
