"""Grayscale image IO.

The reference reads with ``cv2.imread(path, cv2.IMREAD_GRAYSCALE)`` (ITU-R
BT.601 luma) and writes BMP/PNG with ``cv2.imwrite`` (reference
data/dataset.py:61-62, test.py:66, train.py:127). We prefer cv2 when present
and fall back to PIL (same 601 luma coefficients).
"""

import numpy as np

try:
    import cv2

    _HAVE_CV2 = True
except Exception:  # pragma: no cover
    _HAVE_CV2 = False

try:
    from PIL import Image

    _HAVE_PIL = True
except Exception:  # pragma: no cover
    _HAVE_PIL = False


def imread_gray(path, dtype=np.float32):
    if _HAVE_CV2:
        img = cv2.imread(str(path), cv2.IMREAD_GRAYSCALE)
        if img is None:
            raise FileNotFoundError(path)
        return img.astype(dtype)
    if _HAVE_PIL:
        return np.asarray(Image.open(path).convert("L"), dtype=dtype)
    raise RuntimeError("neither cv2 nor PIL available for image IO")


def imwrite(path, img):
    """Write a uint8 image (HW or HWC with C==1/3)."""
    img = np.asarray(img)
    if img.ndim == 3 and img.shape[-1] == 1:
        img = img[..., 0]
    if _HAVE_CV2:
        if not cv2.imwrite(str(path), img):
            raise IOError(f"failed to write {path}")
        return
    if _HAVE_PIL:
        Image.fromarray(img).save(str(path))
        return
    raise RuntimeError("neither cv2 nor PIL available for image IO")
