"""End-to-end CLI test: train -> test -> eval on a synthetic tiny dataset,
verifying the full reference workflow (checkpoint tree, train.log, fused
BMP dumps, xlsx metrics workbook) on CPU."""

import json
import os
import zipfile

import numpy as np
import pytest

from multi_modal_image_fusion_tpu.data.io import imwrite


@pytest.fixture(scope="module")
def tiny_dataset(tmp_path_factory):
    root = tmp_path_factory.mktemp("datasets")
    data_dir = root / "tinyset"
    rng = np.random.RandomState(0)
    for split in ("train", "test"):
        for mod in ("vis", "ir"):
            os.makedirs(data_dir / split / mod)
    for split, n in (("train", 5), ("test", 2)):
        for i in range(n):
            base = (rng.rand(128, 128) * 255).astype(np.uint8)
            noise = (rng.rand(128, 128) * 60).astype(np.uint8)
            imwrite(str(data_dir / split / "vis" / f"{i + 1}.png"), base)
            imwrite(str(data_dir / split / "ir" / f"{i + 1}.png"),
                    255 - base // 2 + noise // 3)
    return str(root)


def test_train_test_eval_roundtrip(tiny_dataset, tmp_path):
    from multi_modal_image_fusion_tpu.cli import eval as eval_cli
    from multi_modal_image_fusion_tpu.cli import test as test_cli
    from multi_modal_image_fusion_tpu.cli import train as train_cli

    ckpt_root = str(tmp_path / "checkpoints")

    ckpt_dir = train_cli.main([
        "--data", "tinyset", "--data_root", tiny_dataset,
        "--ckpt_root", ckpt_root, "--model", "densefuse",
        "--bs", "8", "--epoch", "2",
    ])
    assert os.path.isfile(os.path.join(ckpt_dir, "epoch_last.ckpt"))
    assert os.path.isfile(os.path.join(ckpt_dir, "epoch_best.ckpt"))
    assert os.path.isfile(os.path.join(ckpt_dir, "train.log"))
    assert os.path.isfile(os.path.join(ckpt_dir, "scalars.jsonl"))
    meta = json.load(open(os.path.join(ckpt_dir, "epoch_best.ckpt.json")))
    assert meta["model"] == "densefuse"
    # per-epoch result images
    assert os.path.isfile(os.path.join(ckpt_dir, "train", "02.png"))

    ckpt_name = os.path.basename(ckpt_dir)
    ssim, avg_time = test_cli.main([
        "--data", "tinyset", "--data_root", tiny_dataset,
        "--ckpt_root", ckpt_root, "--ckpt", ckpt_name,
    ])
    assert np.isfinite(ssim)
    dump_dir = os.path.join(ckpt_dir, "tinyset")
    assert os.path.isfile(os.path.join(dump_dir, "01.bmp"))
    assert os.path.isfile(os.path.join(dump_dir, "02.bmp"))
    # test appends to train.log like the reference (test.py:180-187)
    log = open(os.path.join(ckpt_dir, "train.log")).read()
    assert "fps" in log

    # pad_bucket parity: bucketed inference (128x128 inputs padded to 160)
    # must match exact-shape inference within the documented 1e-3 budget
    ssim_b, _ = test_cli.main([
        "--data", "tinyset", "--data_root", tiny_dataset,
        "--ckpt_root", ckpt_root, "--ckpt", ckpt_name,
        "--pad_bucket", "160",
    ])
    assert abs(ssim_b - ssim) < 1e-3, (ssim_b, ssim)

    xlsx = eval_cli.main([
        "--data", "tinyset", "--data_root", tiny_dataset,
        "--ckpt_root", ckpt_root, "--ckpt", ckpt_name,
        "--model", "densefuse",
    ])
    assert os.path.isfile(xlsx)
    with zipfile.ZipFile(xlsx) as z:       # valid xlsx with our sheet
        names = z.namelist()
        assert "xl/workbook.xml" in names
        sheet = z.read("xl/worksheets/sheet1.xml").decode()
        assert "Qabf" in sheet and "SSIM" in sheet


def test_cli_tiles_inference(tiny_dataset, tmp_path):
    """--tiles: height-tiled inference through the test CLI matches the
    untiled run (two-phase tiling for a multi-scale model; 128 rows pad
    to 160 for the 8*4-row slab grid — seam deviation < 1e-3 like
    pad_bucket)."""
    from multi_modal_image_fusion_tpu.cli import test as test_cli
    from multi_modal_image_fusion_tpu.cli import train as train_cli

    ckpt_root = str(tmp_path / "checkpoints")
    ckpt_dir = train_cli.main([
        "--data", "tinyset", "--data_root", tiny_dataset,
        "--ckpt_root", ckpt_root, "--model", "nestfuse",
        "--bs", "4", "--epoch", "1",
    ])
    ckpt_name = os.path.basename(ckpt_dir)
    base = test_cli.main([
        "--data", "tinyset", "--data_root", tiny_dataset,
        "--ckpt_root", ckpt_root, "--ckpt", ckpt_name,
    ])
    tiled = test_cli.main([
        "--data", "tinyset", "--data_root", tiny_dataset,
        "--ckpt_root", ckpt_root, "--ckpt", ckpt_name,
        "--tiles", "4",
    ])
    assert abs(tiled[0] - base[0]) < 1e-3, (tiled[0], base[0])


def test_train_resume(tiny_dataset, tmp_path):
    from multi_modal_image_fusion_tpu.cli import train as train_cli

    ckpt_root = str(tmp_path / "checkpoints")
    first = train_cli.main([
        "--data", "tinyset", "--data_root", tiny_dataset,
        "--ckpt_root", ckpt_root, "--model", "deepfuse",
        "--bs", "8", "--epoch", "1",
    ])
    second = train_cli.main([
        "--data", "tinyset", "--data_root", tiny_dataset,
        "--ckpt_root", ckpt_root, "--model", "deepfuse",
        "--bs", "8", "--epoch", "2",
        "--resume", os.path.basename(first),
    ])
    log = open(os.path.join(second, "train.log")).read()
    assert "resumed from" in log


def test_eval_metric_sheet_layout(tiny_dataset, tmp_path):
    """The alternative one-sheet-per-metric workbook layout (reference
    eval.py:303-361)."""
    import numpy as np

    from multi_modal_image_fusion_tpu.cli.eval import write_workbook
    from multi_modal_image_fusion_tpu.utils.xlsx import Workbook

    rows = [{k: float(i) for i in [1] for k in [
        "sd", "ag", "sf", "mse", "psnr", "cc", "scd", "en", "ce", "mi",
        "qabf", "nabf", "labf", "ssim", "msssim", "viff"]}] * 3
    path = str(tmp_path / "m.xlsx")
    book = Workbook()
    book = write_workbook(path, "DenseFuse", ["a.png", "b.png", "c.png"],
                          rows, sheet_layout="metric", book=book,
                          method_idx=0)
    write_workbook(path, "DeepFuse", ["a.png", "b.png", "c.png"], rows,
                   sheet_layout="metric", book=book, method_idx=1)
    import zipfile

    with zipfile.ZipFile(path) as z:
        wb = z.read("xl/workbook.xml").decode()
        assert 'name="SSIM"' in wb and 'name="Qabf"' in wb
        s1 = z.read("xl/worksheets/sheet1.xml").decode()
        assert "DenseFuse" in s1 and "DeepFuse" in s1


def test_two_stage_training(tiny_dataset, tmp_path):
    """Stage 1: AE reconstruction pretraining; stage 2: fusion training
    initialized from the AE params (--ae then --init_from)."""
    import numpy as np

    from multi_modal_image_fusion_tpu.cli import train as train_cli

    ckpt_root = str(tmp_path / "checkpoints")
    stage1 = train_cli.main([
        "--data", "tinyset", "--data_root", tiny_dataset,
        "--ckpt_root", ckpt_root, "--model", "densefuse",
        "--ae", "--no-use_patches", "--bs", "4", "--epoch", "1",
    ])
    log1 = open(os.path.join(stage1, "train.log")).read()
    assert "train loss" in log1

    stage2 = train_cli.main([
        "--data", "tinyset", "--data_root", tiny_dataset,
        "--ckpt_root", ckpt_root, "--model", "densefuse",
        "--bs", "8", "--epoch", "1",
        "--init_from", os.path.basename(stage1),
    ])
    log2 = open(os.path.join(stage2, "train.log")).read()
    assert "initialized params from" in log2


def test_train_full_res(tiny_dataset, tmp_path):
    """--no-use_patches --no-fix_size: full-resolution pair training
    (BASELINE config #4 shape; the reference always crops, train.py:
    192-201)."""
    from multi_modal_image_fusion_tpu.cli import train as train_cli

    ckpt_root = str(tmp_path / "checkpoints")
    ckpt_dir = train_cli.main([
        "--data", "tinyset", "--data_root", tiny_dataset,
        "--ckpt_root", ckpt_root, "--model", "deepfuse",
        "--bs", "2", "--epoch", "1",
        "--no-use_patches", "--no-fix_size",
    ])
    assert os.path.isfile(os.path.join(ckpt_dir, "epoch_last.ckpt"))
    log = open(os.path.join(ckpt_dir, "train.log")).read()
    assert "cost time" in log


def test_partial_checkpoint_restore(tiny_dataset, tmp_path):
    """strict=False-equivalent restore (reference test.py:176): the test
    CLI must run a checkpoint missing parameter subtrees (a stage-1 AE
    checkpoint lacks the fusion params), keeping missing leaves at
    init."""
    import flax
    import jax
    import jax.numpy as jnp

    from multi_modal_image_fusion_tpu.cli import test as test_cli
    from multi_modal_image_fusion_tpu.models import create_model

    model = create_model("difnet")
    dummy = jnp.zeros((1, 64, 64, 1), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), dummy, dummy,
                           train=False)
    params = flax.core.unfreeze(variables)["params"]
    # drop the learned concat-fuse conv (what an AE-stage run never
    # trains, reference model.py:548-552)
    fuse_keys = [k for k in params if "fuse" in k.lower()]
    assert fuse_keys, list(params)
    for k in fuse_keys:
        del params[k]

    ckpt_dir = tmp_path / "checkpoints" / "ae-stage"
    os.makedirs(ckpt_dir)
    blob = flax.serialization.msgpack_serialize({"params": params})
    (ckpt_dir / "epoch_best.ckpt").write_bytes(blob)
    (ckpt_dir / "epoch_best.ckpt.json").write_text(
        json.dumps({"model": "difnet"}))

    ssim, _ = test_cli.main([
        "--data", "tinyset", "--data_root", tiny_dataset,
        "--ckpt_root", str(tmp_path / "checkpoints"),
        "--ckpt", "ae-stage",
    ])
    assert np.isfinite(ssim)
