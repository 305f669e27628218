"""Utility-layer tests: xlsx writer, meters, scalar logging, histograms."""

import json
import os
import zipfile

import jax.numpy as jnp
import numpy as np

from multi_modal_image_fusion_tpu.utils.meters import AverageMeter
from multi_modal_image_fusion_tpu.utils.xlsx import Workbook, _col_letter


def test_col_letter():
    assert _col_letter(0) == "A"
    assert _col_letter(25) == "Z"
    assert _col_letter(26) == "AA"
    assert _col_letter(27 + 26) == "BB"


def test_workbook_roundtrip(tmp_path):
    wb = Workbook()
    wb.set_column("m1", 0, ["", "mean", "std", "a.png"])
    wb.set_column("m1", 1, ["SSIM", 0.5, 0.1, 0.52])
    wb.set_column("m2", 0, ["Qabf", 0.7])
    path = str(tmp_path / "wb.xlsx")
    wb.save(path)
    with zipfile.ZipFile(path) as z:
        assert "xl/worksheets/sheet1.xml" in z.namelist()
        assert "xl/worksheets/sheet2.xml" in z.namelist()
        s1 = z.read("xl/worksheets/sheet1.xml").decode()
        assert "SSIM" in s1 and "0.52" in s1
        wbx = z.read("xl/workbook.xml").decode()
        assert 'name="m1"' in wbx and 'name="m2"' in wbx


def test_average_meter():
    m = AverageMeter()
    assert m.is_empty()
    m.update(2.0, n=2)
    m.update(4.0, n=1)
    assert m.count == 3
    np.testing.assert_allclose(m.avg, (2.0 * 2 + 4.0) / 3)


def test_scalar_writer(tmp_path):
    from multi_modal_image_fusion_tpu.utils.scalars import ScalarWriter

    w = ScalarWriter(str(tmp_path))
    w.add_scalar("loss", 1.5, 0)
    w.add_scalar("loss", 1.2, 1)
    w.close()
    lines = [json.loads(l) for l in
             open(tmp_path / "scalars.jsonl").read().splitlines()]
    assert lines[0]["tag"] == "loss" and lines[1]["value"] == 1.2


def test_histogram_matmul_matches_numpy():
    from multi_modal_image_fusion_tpu.ops.histogram import (
        histogram256, joint_histogram256)

    r = np.random.RandomState(0)
    a = np.floor(r.rand(300, 257) * 256).astype(np.float32)
    b = np.floor(r.rand(300, 257) * 256).astype(np.float32)
    got = np.asarray(histogram256(jnp.asarray(a)))
    want = np.histogram(a, 256, (0, 256))[0]
    np.testing.assert_array_equal(got, want)

    gotj = np.asarray(joint_histogram256(jnp.asarray(a), jnp.asarray(b)))
    wantj = np.histogram2d(a.ravel(), b.ravel(), 256,
                           ((0, 256), (0, 256)))[0]
    np.testing.assert_array_equal(gotj, wantj)


def test_model_profile_smoke():
    from multi_modal_image_fusion_tpu.models.profile import profile_model

    p = profile_model("deepfuse", size=64, runs=2)
    assert p["params"] == 88961        # reference param count
    assert p["latency_ms"] > 0
