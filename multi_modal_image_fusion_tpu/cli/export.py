"""Serving export CLI: serialize a fused-forward graph to a portable
StableHLO artifact via `jax.export`.

The reference's deployment story ends at an inference loop inside
test.py (reference test.py:41-61: load a torch checkpoint, run batch-1
eval); serving it elsewhere means shipping Python + torch + the model
zoo. The TPU-native equivalent is ahead-of-time export: the jitted
forward (including any Pallas kernels the lowering platform engages) is
traced once, serialized as versioned StableHLO bytes, and can be
reloaded and executed by any JAX process — or embedded in a C++/serving
runtime via the PJRT loaded-executable path — without this package or
its Python model code on the serving host.

Artifact layout: `<out>` holds `jax.export.Exported.serialize()` bytes;
`<out>.json` a human-readable sidecar (model, shapes, dtype, lowering
platform, param count).

Usage:
  python -m multi_modal_image_fusion_tpu.cli.export --ckpt <dir> \
      --height 1224 --width 1024 --batch 1 --out model.mmifx
  python -m multi_modal_image_fusion_tpu.cli.export --model densefuse \
      --symbolic_batch --out densefuse.mmifx     # random-init, batch-polymorphic

`--symbolic_batch` exports one graph serving any batch size (no per-batch
recompiles at load time). It requires the traced graph to be shape-
polymorphic, which the TPU chain fast path (static Pallas grids) is not —
exports with a symbolic batch force the portable XLA path via
MMIF_NO_PALLAS semantics on the model side; static-batch exports keep
whatever fast path the lowering platform engages.
"""

import argparse
import json
import os

import numpy as np

from . import common as _common  # noqa: F401  (applies MMIF_PLATFORM
#                                  before any backend init, like the
#                                  other CLIs — cli/common.py:20-24)


def build_forward(model, variables):
    def fuse(img1, img2):
        return model.apply(variables, img1, img2, train=False)

    return fuse


def export_model(model, variables, batch, height, width, dtype="float32",
                 symbolic_batch=False, platforms=None):
    """Trace + export the fused forward; returns `jax.export.Exported`."""
    import jax
    from jax import export as jexport

    fuse = build_forward(model, variables)
    if symbolic_batch:
        (b,) = jexport.symbolic_shape("b")
        shape = (b, height, width, 1)
    else:
        shape = (batch, height, width, 1)
    spec = jax.ShapeDtypeStruct(shape, dtype)
    kw = {"platforms": platforms} if platforms else {}
    prev = os.environ.get("MMIF_NO_PALLAS")
    if symbolic_batch:
        # the chain fast path builds static Pallas grids — not shape-
        # polymorphic; force the portable XLA lowering for the trace
        os.environ["MMIF_NO_PALLAS"] = "1"
    try:
        return jexport.export(jax.jit(fuse), **kw)(spec, spec)
    finally:
        if symbolic_batch:
            if prev is None:
                os.environ.pop("MMIF_NO_PALLAS", None)
            else:
                os.environ["MMIF_NO_PALLAS"] = prev


def verify_roundtrip(blob, model, variables, batch, height, width,
                     dtype="float32", seed=0):
    """Deserialize `blob`, run it, and compare against a direct apply.

    Returns the max abs deviation (f32). Deviations are expected to be 0
    on the same process/platform — the deserialized graph is the same
    compiled computation."""
    import jax.numpy as jnp
    from jax import export as jexport

    r = np.random.RandomState(seed)
    x1 = jnp.asarray(r.rand(batch, height, width, 1), dtype)
    x2 = jnp.asarray(r.rand(batch, height, width, 1), dtype)
    got = jexport.deserialize(blob).call(x1, x2)
    want = build_forward(model, variables)(x1, x2)
    return float(jnp.max(jnp.abs(got.astype(jnp.float32)
                                 - want.astype(jnp.float32))))


def get_export_parser():
    p = argparse.ArgumentParser("mmif-export")
    p.add_argument("--ckpt", default=None, type=str,
                   help="checkpoint dir (as cli.test); omit for random init")
    p.add_argument("--ckpt_root", default=None, type=str)
    p.add_argument("--model", default=None, type=str,
                   help="model name (default: checkpoint meta, else deepfuse)")
    p.add_argument("--height", default=1224, type=int)
    p.add_argument("--width", default=1024, type=int)
    p.add_argument("--batch", default=1, type=int)
    p.add_argument("--symbolic_batch", action="store_true",
                   help="batch-polymorphic export (one graph, any batch)")
    p.add_argument("--dtype", default="float32",
                   choices=["float32", "bfloat16"])
    p.add_argument("--out", default=None, type=str,
                   help="output path (default <model>.mmifx)")
    p.add_argument("--no-verify", dest="verify", action="store_false",
                   help="skip the deserialize + numeric roundtrip check")
    return p


def main(argv=None):
    args = get_export_parser().parse_args(argv)

    import flax
    import jax

    from ..models import create_model
    from ..train.checkpoint import load_checkpoint_meta

    model_cfg = {}
    variables = None
    model_name = args.model
    if args.ckpt:
        root = args.ckpt_root or os.path.join(
            os.path.dirname(__file__), "..", "..", "..", "checkpoints")
        ckpt_dir = os.path.join(root, args.ckpt)
        ckpt_path = os.path.join(ckpt_dir, "epoch_best.ckpt")
        if not os.path.isfile(ckpt_path):
            ckpt_path = os.path.join(ckpt_dir, "epoch_last.ckpt")
        assert os.path.isfile(ckpt_path), f"no checkpoint under {ckpt_dir}"
        meta = load_checkpoint_meta(ckpt_path)
        if model_name is None:
            model_name = meta.get("model", "deepfuse")
            model_cfg = meta.get("model_cfg", {})
        with open(ckpt_path, "rb") as f:
            restored = flax.serialization.msgpack_restore(f.read())
        variables = {"params": restored["params"]}
        if restored.get("batch_stats"):
            variables["batch_stats"] = restored["batch_stats"]

    model_name = model_name or "deepfuse"
    model = create_model(model_name, **model_cfg)
    if variables is None:
        import jax.numpy as jnp
        x = jnp.zeros((1, 64, 64, 1), jnp.float32)
        variables = model.init(jax.random.PRNGKey(0), x, x, train=False)
        variables = {k: v for k, v in variables.items()}
        print("warning: no --ckpt given; exporting RANDOM-INIT params")

    exported = export_model(model, variables, args.batch, args.height,
                            args.width, dtype=args.dtype,
                            symbolic_batch=args.symbolic_batch)
    blob = exported.serialize()

    out = args.out or f"{model_name}.mmifx"
    with open(out, "wb") as f:
        f.write(blob)
    n_params = sum(int(np.prod(p.shape))
                   for p in jax.tree.leaves(variables["params"]))
    sidecar = {
        "model": model_name,
        "model_cfg": model_cfg,
        "batch": "symbolic" if args.symbolic_batch else args.batch,
        "height": args.height, "width": args.width, "dtype": args.dtype,
        "platforms": list(exported.platforms),
        "params_m": round(n_params / 1e6, 4),
        "calling_convention_version": exported.calling_convention_version,
    }
    with open(out + ".json", "w") as f:
        json.dump(sidecar, f, indent=1)
    print(f"exported {model_name} -> {out} "
          f"({len(blob) / 1e6:.2f} MB, platforms {sidecar['platforms']})")

    if args.verify:
        dev = verify_roundtrip(blob, model, variables,
                               args.batch if not args.symbolic_batch else 2,
                               args.height, args.width, dtype=args.dtype)
        # a symbolic-batch export traces the portable XLA path while the
        # direct apply may take the TPU chain fast path; those agree to
        # kernel parity (1e-4-ish in bf16), not bit-exactness
        cross_path = (args.symbolic_batch
                      and jax.default_backend() == "tpu")
        tol = 1e-5 if args.dtype == "float32" and not cross_path else 5e-2
        print(f"roundtrip max abs dev: {dev:.3e}")
        assert dev <= tol, f"roundtrip deviation {dev} above {tol}"
    return out


if __name__ == "__main__":
    main()
