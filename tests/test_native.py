"""Native (C++) data-kernel parity vs the numpy reference implementations."""

import numpy as np
import pytest

from multi_modal_image_fusion_tpu.data import native
from multi_modal_image_fusion_tpu.data.patches import extract_patches
from multi_modal_image_fusion_tpu.data.transform import norm, transform

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native lib not built")


def test_extract_patches_native():
    img = np.random.RandomState(0).rand(130, 200).astype(np.float32)
    got = native.extract_patches(img, 64, 64)
    want = extract_patches(img, 64, 64)
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("mode", range(8))
def test_dihedral_native(mode):
    img = np.random.RandomState(1).rand(37, 53).astype(np.float32)
    got = native.dihedral(img, mode)
    want = np.ascontiguousarray(transform(img, mode))
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("mode", [None, "min-max", "z-score"])
def test_normalize_native(mode):
    img = (np.random.RandomState(2).rand(64, 64) * 255).astype(np.float32)
    got = native.normalize(img, mode)
    want = norm(img, mode)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_gather_batch_native():
    patches = np.random.RandomState(3).rand(50, 16, 16).astype(np.float32)
    idx = np.array([4, 7, 0, 49, 12], np.int64)
    got = native.gather_batch(patches, idx)
    want = patches[idx][..., None]
    np.testing.assert_array_equal(got, want)
