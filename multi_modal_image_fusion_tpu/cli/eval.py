"""Batch metric-evaluation CLI (reference eval.py re-built for TPU):
reads source pairs + dumped fused images, computes the 16-metric bundle
*on device* (one jit-compiled call per image shape — the reference loops
per-metric per-image on host, eval.py:181-231 and even discards its own
`.to(device)`, eval.py:198-200), and writes per-method xlsx workbooks with
per-image rows plus mean/std summary rows.

Usage: python -m multi_modal_image_fusion_tpu.cli.eval --data roadscene \
           --ckpt <timestamp-dir>
"""

import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from ..data.io import imread_gray
from ..ops.metrics import eval_metrics
from ..utils.natsort import natsorted
from ..utils.xlsx import Workbook
from .common import dataset_layout, get_test_parser, resolve_data_dir

METRIC_KEYS = ["sd", "ag", "sf", "mse", "psnr", "cc", "scd", "en", "ce",
               "mi", "qabf", "nabf", "labf", "ssim", "msssim", "viff"]
METRIC_LABELS = ["SD", "AG", "SF", "MSE", "PSNR", "CC", "SCD", "EN", "CE",
                 "MI", "Qabf", "Nabf", "Labf", "SSIM", "MSSSIM", "VIFF"]


def eval_method(img1_dir, img2_dir, imgf_dir, spatial=0):
    """Evaluate one method's dumped results; returns (names, rows) where
    rows[i] is the 16-metric dict for image i.

    Images are grouped by shape and evaluated as one vmapped device call
    per group (per-image reductions fall out of vmap automatically) — the
    reference loops per image per metric on host (eval.py:181-231).

    spatial>1 places the stacks height-sharded and lets GSPMD partition
    the whole 16-metric bundle (windowed convs get compiler-inserted
    halo exchanges; histogram/moment reductions become psums) — exact by
    construction, for when one full-res bundle exceeds a chip or to
    spread a large eval across the mesh. device_put needs even splits,
    so each shape group uses the largest device count <= spatial that
    divides its height (1 = unsharded fallback, noted)."""
    def make_place(h):
        if not spatial or spatial <= 1:
            return lambda x: x
        limit = min(spatial, len(jax.devices()))
        n = max(d for d in range(1, limit + 1) if h % d == 0)
        if n == 1:
            print(f"note: H={h} has no divisor <= {spatial}; "
                  f"evaluating this shape group unsharded")
            return lambda x: x
        from jax.sharding import NamedSharding, PartitionSpec as P

        from ..parallel.mesh import make_mesh
        mesh = make_mesh(jax.devices()[:n])
        sh = NamedSharding(mesh, P(None, None, "data"))
        return lambda x: jax.device_put(x, sh)

    jit_eval_batch = jax.jit(jax.vmap(eval_metrics))
    # same pairing filter as FusionDataset._list_pairs: only images whose
    # partner exists are enumerated, so the NN.bmp indices dumped by
    # cli/test.py and the indices read here share one index space even if
    # the vis dir contains unpaired images
    files = [f for f in natsorted(os.listdir(img1_dir))
             if f.endswith((".bmp", ".jpg", ".png"))
             and os.path.isfile(os.path.join(img2_dir, f))]

    groups = {}          # shape -> list of (orig_idx, name, i1, i2, if)
    for i, img in enumerate(files):
        imgf_path = os.path.join(imgf_dir, f"{i + 1:0>2}.bmp")
        if not os.path.isfile(imgf_path):
            print(f"skipping {img}: no fused result {imgf_path}")
            continue
        img1 = imread_gray(os.path.join(img1_dir, img))
        img2 = imread_gray(os.path.join(img2_dir, img))
        imgf = imread_gray(imgf_path)
        groups.setdefault(img1.shape, []).append((i, img, img1, img2,
                                                  imgf))

    results = {}
    for shape, items in groups.items():
        stack = lambda idx: jnp.asarray(
            np.stack([it[idx] for it in items]))[:, None, ..., None]
        place = make_place(shape[0])
        out = jit_eval_batch(place(stack(2)), place(stack(3)),
                             place(stack(4)))
        out = {k: np.asarray(v) for k, v in out.items()}
        for j, (i, img, *_rest) in enumerate(items):
            results[i] = (img, {k: float(v[j]) for k, v in out.items()})
            print(f"evaluating {img} ... done")

    names, rows = [], []
    for i in sorted(results):
        img, row = results[i]
        names.append(img)
        rows.append(row)
    return names, rows


def write_workbook(save_path, method_name, names, rows,
                   sheet_layout="method", book=None, method_idx=0):
    """xlsx layout identical to the reference (eval.py:268-361): either one
    sheet per method (metric columns) or one sheet per metric (method
    columns); first two data rows are mean and std."""
    book = book or Workbook()

    cols = {}
    for key in METRIC_KEYS:
        vals = [r[key] for r in rows]
        vals.insert(0, float(np.mean(vals)) if vals else 0.0)
        vals.insert(1, float(np.std(vals)) if vals else 0.0)
        cols[key] = vals
    name_col = ["mean", "std"] + list(names)

    if sheet_layout == "method":
        book.set_column(method_name, 0, [""] + name_col)
        for j, (key, label) in enumerate(zip(METRIC_KEYS, METRIC_LABELS)):
            book.set_column(method_name, j + 1, [label] + cols[key])
    else:  # one sheet per metric
        for key, label in zip(METRIC_KEYS, METRIC_LABELS):
            if method_idx == 0:
                book.set_column(label, 0, [""] + name_col)
            book.set_column(label, method_idx + 1,
                            [method_name] + cols[key])
    book.save(save_path)
    return book


def main(argv=None):
    from ..utils.compile_cache import enable_compilation_cache
    enable_compilation_cache()
    parser = get_test_parser()
    parser.add_argument("--methods", default=None, type=str,
                        help="comma-separated method names "
                             "(default: the checkpoint's model)")
    parser.add_argument("--sheet", default="method",
                        choices=["method", "metric"])
    args = parser.parse_args(argv)

    data_dir, _ = resolve_data_dir(args)
    _, set_name_test, img_type = dataset_layout(args.data)
    if set_name_test is None:
        img1_dir = os.path.join(data_dir, "vis")
        img2_dir = os.path.join(data_dir, img_type)
    else:
        img1_dir = os.path.join(data_dir, set_name_test, "vis")
        img2_dir = os.path.join(data_dir, set_name_test, img_type)

    ckpt_root = args.ckpt_root or os.path.join(
        os.path.dirname(__file__), "..", "..", "..", "checkpoints")
    ckpt_dir = os.path.join(ckpt_root, args.ckpt)
    imgf_dir = os.path.join(ckpt_dir, args.data)

    methods = (args.methods.split(",") if args.methods
               else [args.model or "model"])
    save_path = os.path.join(ckpt_dir,
                             f"metrics_{args.data}_{methods[0]}.xlsx")

    book = Workbook()
    done = {}     # resolved imgf dir -> (names, rows): identical dirs
    # evaluate once (the reference re-evaluates the same dir per method
    # name — its per-method dir line is commented out, eval.py:171)
    for mi, method in enumerate(methods):
        method_dir = os.path.join(imgf_dir, method)
        resolved = method_dir if os.path.isdir(method_dir) else imgf_dir
        print(f"evaluating {method} ({resolved}) ...")
        start = time.time()
        if resolved not in done:
            done[resolved] = eval_method(img1_dir, img2_dir, resolved,
                                         spatial=args.spatial)
        names, rows = done[resolved]
        print(f"evaluating {method} done, cost {time.time() - start:.3f}s")
        book = write_workbook(save_path, method, names, rows, args.sheet,
                              book, mi)
    print(f"wrote {save_path}")
    return save_path


if __name__ == "__main__":
    main()
