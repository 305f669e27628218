"""Normalization and dihedral-group augmentation (reference data/transform.py).

Host-side, numpy-only: these run in the input pipeline before device transfer.
Layout note: images here are HW (grayscale) or HWC; the framework's device
layout is NHWC.
"""

import numpy as np

eps = 1e-7


def norm(img, mode=None):
    """Normalize a float32 image (reference data/transform.py:15-29)."""
    if mode is None:
        return img / 255.0
    elif mode == "min-max":
        lo = img.min()
        hi = img.max()
        return (img - lo) / np.clip(hi - lo, eps, None)
    elif mode == "z-score":
        mu = img.mean()
        sd = img.std()
        return (img - mu) / np.clip(sd, eps, None)
    raise ValueError("only supported ['min-max', 'z-score'] mode")


def denorm(img):
    """[0,1] float (HWC or CHW-free: any shape ending in HW or HWC) -> uint8
    HWC image (reference data/transform.py:32-35 does CHW->HWC; our device
    layout is already NHWC so no transpose is needed for HWC inputs)."""
    img = np.asarray(img)
    im = np.clip(img, 0.0, 1.0) * 255.0
    if im.ndim == 2:
        im = im[..., None]
    return im.astype(np.uint8)


def transform(img, mode=0):
    """The 8 dihedral-group transforms (reference data/transform.py:38-66)."""
    if mode == 0:
        return img
    elif mode == 1:
        img = np.fliplr(img)
    elif mode == 2:
        img = np.rot90(img, k=2)
    elif mode == 3:
        img = np.flipud(img)
    elif mode == 4:
        img = np.rot90(img, k=1)
    elif mode == 5:
        img = np.flipud(np.rot90(img, k=1))
    elif mode == 6:
        img = np.rot90(img, k=-1)
    elif mode == 7:
        img = np.flipud(np.rot90(img, k=-1))
    return img
