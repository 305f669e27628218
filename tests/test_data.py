"""Data layer tests: transforms, patch extraction, natural sort, the
sklearn-compatible split, and dataset pairing on the bundled reference
samples (if present)."""

import os

import numpy as np
import pytest

from multi_modal_image_fusion_tpu.data.patches import extract_patches, \
    patchify
from multi_modal_image_fusion_tpu.data.transform import denorm, norm, \
    transform
from multi_modal_image_fusion_tpu.utils.natsort import natsorted
from multi_modal_image_fusion_tpu.utils.split import split_indices

SAMPLES = "/root/reference/data/samples"


def test_norm_modes():
    img = np.arange(12, dtype=np.float32).reshape(3, 4) * 20
    np.testing.assert_allclose(norm(img), img / 255.0)
    mm = norm(img, "min-max")
    assert mm.min() == 0.0 and mm.max() == 1.0
    zs = norm(img, "z-score")
    np.testing.assert_allclose(zs.mean(), 0.0, atol=1e-6)
    np.testing.assert_allclose(zs.std(), 1.0, atol=1e-5)
    with pytest.raises(ValueError):
        norm(img, "bogus")


def test_denorm_clips_and_casts():
    img = np.array([[-0.5, 0.5], [1.5, 1.0]], dtype=np.float32)
    out = denorm(img)
    assert out.dtype == np.uint8
    assert out.shape == (2, 2, 1)
    np.testing.assert_array_equal(out[..., 0],
                                  [[0, 127], [255, 255]])


def test_dihedral_transforms_are_a_group():
    img = np.arange(16, dtype=np.float32).reshape(4, 4)
    outs = [transform(img, m) for m in range(8)]
    # all 8 distinct, same multiset of values
    for i in range(8):
        for j in range(i + 1, 8):
            assert not np.array_equal(outs[i], outs[j])
        np.testing.assert_array_equal(np.sort(outs[i], axis=None),
                                      np.sort(img, axis=None))


def test_patchify_matches_reference_tiling():
    img = np.arange(130 * 200, dtype=np.float32).reshape(130, 200)
    v = patchify(img, 64, 64)
    assert v.shape == (2, 3, 64, 64)     # floor((130-64)/64)+1, ...
    np.testing.assert_array_equal(v[0, 0], img[:64, :64])
    np.testing.assert_array_equal(v[1, 2], img[64:128, 128:192])
    flat = extract_patches(img, 64, 64)
    assert flat.shape == (6, 64, 64)


def test_natsorted():
    names = ["10.png", "2.png", "1.png", "img10.png", "img2.png"]
    assert natsorted(names) == ["1.png", "2.png", "10.png", "img2.png",
                                "img10.png"]


def test_split_matches_sklearn():
    sklearn = pytest.importorskip("sklearn.model_selection")
    items = [f"f{i}" for i in range(37)]
    ours_train, ours_test = split_indices(len(items), 0.2, 0)
    sk_train, sk_test = sklearn.train_test_split(list(range(37)),
                                                 test_size=0.2,
                                                 random_state=0)
    assert list(ours_train) == sk_train
    assert list(ours_test) == sk_test


@pytest.mark.skipif(not os.path.isdir(SAMPLES), reason="no sample data")
def test_fusion_dataset_on_samples():
    from multi_modal_image_fusion_tpu.data.dataset import FusionDataset

    ds = FusionDataset(os.path.join(SAMPLES, "infrared"), set_name="test",
                       set_type="test", img_type="ir")
    assert len(ds) == 16
    img1, img2 = ds[0]
    assert img1.shape == img2.shape
    assert img1.dtype == np.float32
    assert 0.0 <= img1.min() and img1.max() <= 1.0


@pytest.mark.skipif(not os.path.isdir(SAMPLES), reason="no sample data")
def test_fusion_patches_on_samples():
    from multi_modal_image_fusion_tpu.data.dataset import FusionPatches

    ds = FusionPatches(os.path.join(SAMPLES, "polar"), set_name="test",
                       set_type="test", img_type="po")
    p1, p2 = ds[0]
    assert p1.shape == (64, 64)
    # 1224x1024 -> 19*16 patches per image, 5 pairs
    assert len(ds) == 5 * 19 * 16


def test_feeder_batches():
    from multi_modal_image_fusion_tpu.data.pipeline import Feeder

    class Toy:
        def __len__(self):
            return 10

        def __getitem__(self, i):
            a = np.full((8, 8), float(i), np.float32)
            return a, a + 100

    f = Feeder(Toy(), batch_size=4, shuffle=False, drop_last=True)
    batches = list(f)
    assert len(batches) == 2
    b1, b2 = batches[0]
    assert b1.shape == (4, 8, 8, 1)
    np.testing.assert_allclose(np.asarray(b2) - np.asarray(b1), 100.0)


def test_feeder_workers_ordering():
    """workers>0 parallelizes item loading but must preserve batch
    order/content for deterministic datasets."""
    from multi_modal_image_fusion_tpu.data.pipeline import Feeder

    class Toy:
        def __len__(self):
            return 13

        def __getitem__(self, i):
            return np.full((4, 4), float(i), np.float32)

    ref = [np.asarray(b) for b in
           Feeder(Toy(), batch_size=4, shuffle=True, seed=3)]
    got = [np.asarray(b) for b in
           Feeder(Toy(), batch_size=4, shuffle=True, seed=3, workers=4)]
    assert len(ref) == len(got)
    for a, b in zip(ref, got):
        np.testing.assert_array_equal(a, b)
