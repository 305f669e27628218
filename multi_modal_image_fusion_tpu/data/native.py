"""ctypes binding for the native host-side data kernels (native/
mmif_native.cpp) with transparent numpy fallbacks.

The native path accelerates the input pipeline's byte work (patch tiling,
dihedral augmentation, normalization, batch packing) — the role the
reference delegates to torch DataLoader worker processes. `available()`
reports whether the shared library was found/built.
"""

import ctypes
import os

import numpy as np

_LIB = None


def _find_lib():
    here = os.path.dirname(os.path.abspath(__file__))
    cands = [
        os.path.join(here, "..", "..", "native", "libmmif_native.so"),
        os.path.join(here, "libmmif_native.so"),
    ]
    for c in cands:
        if os.path.isfile(c):
            return c
    return None


def _load():
    global _LIB
    if _LIB is not None:
        return _LIB
    path = _find_lib()
    if path is None:
        # try building it on the fly (toolchain is available in-image)
        src_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "..", "..", "native")
        if os.path.isfile(os.path.join(src_dir, "Makefile")):
            import subprocess

            try:
                subprocess.run(["make", "-C", src_dir], check=True,
                               capture_output=True)
                path = _find_lib()
            except Exception:
                path = None
    if path is None:
        _LIB = False
        return False

    lib = ctypes.CDLL(path)
    f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
    i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
    c = ctypes.c_int
    c64 = ctypes.c_int64

    lib.extract_patches_f32.argtypes = [f32p, c, c, c, c, c, c, f32p]
    lib.extract_patches_f32.restype = c
    lib.extract_patches_u8_norm.argtypes = [u8p, c, c, c, c, c, c, f32p]
    lib.extract_patches_u8_norm.restype = c
    lib.dihedral_f32.argtypes = [f32p, c, c, c, f32p]
    lib.normalize_f32.argtypes = [f32p, c64, c, f32p]
    lib.gather_batch_f32.argtypes = [f32p, i64p, c, c64, f32p]
    _LIB = lib
    return lib


def available():
    return bool(_load())


def extract_patches(img, patch_size, step):
    """Native patch tiling; numpy fallback (data/patches.py)."""
    lib = _load()
    img = np.ascontiguousarray(img, np.float32)
    h, w = img.shape
    if not lib:
        from .patches import extract_patches as np_extract

        return np_extract(img, patch_size, step)
    nh = (h - patch_size) // step + 1
    nw = (w - patch_size) // step + 1
    out = np.empty((nh * nw, patch_size, patch_size), np.float32)
    n = lib.extract_patches_f32(img, h, w, patch_size, patch_size, step,
                                step, out)
    return out[:n]


def dihedral(img, mode):
    """Native dihedral transform; numpy fallback (data/transform.py)."""
    lib = _load()
    if not lib:
        from .transform import transform

        return np.ascontiguousarray(transform(img, mode))
    img = np.ascontiguousarray(img, np.float32)
    h, w = img.shape
    out_shape = (h, w) if mode < 4 else (w, h)
    out = np.empty(out_shape, np.float32)
    lib.dihedral_f32(img, h, w, mode, out)
    return out


def normalize(img, mode=None):
    """Native normalization; numpy fallback."""
    lib = _load()
    if not lib:
        from .transform import norm

        return norm(np.asarray(img, np.float32), mode)
    img = np.ascontiguousarray(img, np.float32)
    out = np.empty_like(img)
    mode_id = {None: 0, "min-max": 1, "z-score": 2}[mode]
    lib.normalize_f32(img.reshape(-1), img.size, mode_id,
                      out.reshape(-1))
    return out


def gather_batch(patches, indices):
    """Pack patches[indices] into an (n, h, w, 1) NHWC batch."""
    lib = _load()
    patches = np.ascontiguousarray(patches, np.float32)
    indices = np.ascontiguousarray(indices, np.int64)
    n = len(indices)
    h, w = patches.shape[-2:]
    if not lib:
        return patches[indices][..., None].copy()
    out = np.empty((n, h, w, 1), np.float32)
    lib.gather_batch_f32(patches.reshape(len(patches), -1),
                         indices, n, h * w, out.reshape(n, -1))
    return out
