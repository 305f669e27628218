"""File-based pair datasets (reference data/dataset.py, data/patches.py).

Torch-free: items are numpy arrays in HW layout; `Feeder` (pipeline.py) stacks
them into NHWC device batches. Semantics preserved from the reference:

- images are listed from the ``vis/`` dir with natural sort and paired by the
  filename substitution ``vis -> ir|po`` (dataset.py:92-109)
- train/valid is an 80/20 split with sklearn(random_state=0) ordering
  (dataset.py:111-114)
- `FusionPatches` eagerly loads every image and tiles non-overlapping
   64x64 patches (patches.py:26-27, 106-123), then shuffles once with
  python's seeded `random.shuffle` (patches.py:123)
- per-item augmentation: random flip (datasets) or one of 8 dihedral
  transforms (patches) (dataset.py:68-69, patches.py:66-68)
"""

import os
import random

import numpy as np

from ..utils.natsort import natsorted
from ..utils.split import train_test_split
from .io import imread_gray
from .transform import norm, transform

img_size = 256
patch_size = 64
patch_step = 64

_IMG_EXTS = (".bmp", ".jpg", ".png")


def _list_pairs(root_dir, set_name, img_type):
    if set_name is None:
        img_dir = os.path.join(root_dir, "vis")
    else:
        img_dir = os.path.join(root_dir, set_name, "vis")

    img1_info, img2_info = [], []
    for img in natsorted(os.listdir(img_dir)):
        if img.endswith(_IMG_EXTS):
            img1_path = os.path.join(img_dir, img)
            img2_path = img1_path.replace("vis", img_type)
            if os.path.isfile(img2_path):
                img1_info.append(img1_path)
                img2_info.append(img2_path)
    return img1_info, img2_info


def _resize(img, size):
    """Bilinear resize of an HW image to size x size."""
    try:
        import cv2

        return cv2.resize(img, (size, size), interpolation=cv2.INTER_LINEAR)
    except Exception:  # pragma: no cover
        from PIL import Image

        return np.asarray(
            Image.fromarray(img).resize((size, size), Image.BILINEAR),
            dtype=img.dtype)


class FusionDataset:
    """Full-image pair dataset (reference data/dataset.py:29-116)."""

    def __init__(self,
                 root_dir,
                 set_name=None,
                 set_type="train",
                 img_type="ir",
                 norm=None,
                 transform=False,
                 fix_size=False,
                 rng=None):
        assert set_type in ("train", "valid", "test")
        assert img_type in ("ir", "po")
        self.root_dir = root_dir
        self.set_type = set_type
        self.norm = norm
        self.transform = transform
        self.fix_size = fix_size
        self.rng = rng if rng is not None else np.random

        img1_info, img2_info = _list_pairs(root_dir, set_name, img_type)
        if set_type in ("train", "valid"):
            tr1, va1, tr2, va2 = train_test_split(img1_info,
                                                  img2_info,
                                                  test_size=0.2,
                                                  random_state=0)
            if set_type == "train":
                self.data_info = list(zip(tr1, tr2))
            else:
                self.data_info = list(zip(va1, va2))
        else:
            self.data_info = list(zip(img1_info, img2_info))

    def __len__(self):
        assert len(self.data_info) > 0
        return len(self.data_info)

    def __getitem__(self, index):
        img1_path, img2_path = self.data_info[index]
        img1 = imread_gray(img1_path)
        img2 = imread_gray(img2_path)

        pair = tuple(norm(im, mode=self.norm) for im in (img1, img2))

        if self.transform:
            idx = self.rng.choice(2)
            pair = tuple(transform(im, mode=idx) for im in pair)

        if self.fix_size:
            pair = self._fix_size(pair)

        return tuple(np.ascontiguousarray(im, dtype=np.float32)
                     for im in pair)

    def _fix_size(self, pair):
        h, w = pair[0].shape[-2:]
        min_size = min(h, w)
        if min_size < img_size:
            crop = min_size
        else:
            crop = img_size
        top = self.rng.randint(0, h - crop + 1)
        left = self.rng.randint(0, w - crop + 1)
        pair = tuple(im[top:top + crop, left:left + crop] for im in pair)
        if crop < img_size:
            pair = tuple(_resize(im, img_size) for im in pair)
        return pair


class AEDataset:
    """Single-image autoencoder dataset over both modality dirs, shuffled
    (reference data/dataset.py:119-186). Supports two-stage AE pretraining."""

    def __init__(self,
                 root_dir,
                 set_name=None,
                 img_type="ir",
                 norm=None,
                 transform=False,
                 fix_size=False,
                 rng=None):
        assert img_type in ("ir", "po")
        self.norm = norm
        self.transform = transform
        self.fix_size = fix_size
        self.rng = rng if rng is not None else np.random

        if set_name is None:
            img1_dir = os.path.join(root_dir, "vis")
        else:
            img1_dir = os.path.join(root_dir, set_name, "vis")
        img2_dir = img1_dir.replace("vis", img_type)

        self.data_info = []
        for d in (img1_dir, img2_dir):
            for img in natsorted(os.listdir(d)):
                if img.endswith(_IMG_EXTS):
                    self.data_info.append(os.path.join(d, img))
        random.shuffle(self.data_info)

    def __len__(self):
        assert len(self.data_info) > 0
        return len(self.data_info)

    def __getitem__(self, index):
        img = imread_gray(self.data_info[index])
        img = norm(img, mode=self.norm)
        if self.transform:
            img = transform(img, mode=self.rng.choice(2))
        if self.fix_size:
            h, w = img.shape[-2:]
            crop = min(img_size, h, w)
            top = self.rng.randint(0, h - crop + 1)
            left = self.rng.randint(0, w - crop + 1)
            img = img[top:top + crop, left:left + crop]
            if crop < img_size:
                img = _resize(img, img_size)
        return np.ascontiguousarray(img, dtype=np.float32)


class FusionPatches:
    """Eager 64x64 patch-pair dataset (reference data/patches.py:30-123)."""

    def __init__(self,
                 root_dir,
                 set_name=None,
                 set_type="train",
                 img_type="ir",
                 norm=None,
                 transform=False,
                 rng=None):
        assert set_type in ("train", "valid", "test")
        assert img_type in ("ir", "po")
        self.norm = norm
        self.transform = transform
        self.rng = rng if rng is not None else np.random

        img1_info, img2_info = _list_pairs(root_dir, set_name, img_type)
        if set_type in ("train", "valid"):
            tr1, va1, tr2, va2 = train_test_split(img1_info,
                                                  img2_info,
                                                  test_size=0.2,
                                                  random_state=0)
            data_info = list(zip(tr1, tr2)) if set_type == "train" else list(
                zip(va1, va2))
        else:
            data_info = list(zip(img1_info, img2_info))
        self.data_info = data_info

        from .patches import extract_patches

        self.patch_pairs = []
        for img1_path, img2_path in data_info:
            p1 = extract_patches(imread_gray(img1_path), patch_size,
                                 patch_step)
            p2 = extract_patches(imread_gray(img2_path), patch_size,
                                 patch_step)
            self.patch_pairs.extend(list(zip(p1, p2)))
        random.shuffle(self.patch_pairs)

    def __len__(self):
        assert len(self.patch_pairs) > 0
        return len(self.patch_pairs)

    def __getitem__(self, index):
        pair = self.patch_pairs[index]
        pair = tuple(norm(p, mode=self.norm) for p in pair)
        if self.transform:
            idx = self.rng.choice(8)
            pair = tuple(transform(p, mode=idx) for p in pair)
        return tuple(np.ascontiguousarray(p, dtype=np.float32) for p in pair)
