"""Deterministic synthetic weights for model-forward parity fixtures.

tools/gen_golden.py loads these values into the PyTorch reference models
and records their outputs; tests/test_model_parity.py regenerates the SAME
values by key (no torch needed, no megabytes of weights in git) and feeds
them through utils/torch_convert.convert_state_dict. The only thing stored
in the .npz is the key->shape table plus inputs/outputs.

Values are a pure function of (torch key, shape): a crc32-seeded
RandomState per key, scaled so deep stacks keep finite, non-degenerate
activations (fan-in normalized conv weights, near-identity norms).
"""

import zlib

import numpy as np


def synth_value(key, shape):
    shape = tuple(int(s) for s in shape)
    if key.endswith("num_batches_tracked"):
        return np.zeros(shape, np.int64)
    r = np.random.RandomState(zlib.crc32(key.encode()) & 0x7FFFFFFF)
    if key.endswith("running_mean"):
        return (0.1 * (r.rand(*shape) - 0.5)).astype(np.float32)
    if key.endswith("running_var"):
        return (1.0 + 0.2 * r.rand(*shape)).astype(np.float32)
    if key.endswith(".bias"):
        return (0.1 * (r.rand(*shape) - 0.5)).astype(np.float32)
    if len(shape) == 1:   # norm scale
        return (1.0 + 0.2 * (r.rand(*shape) - 0.5)).astype(np.float32)
    # conv / deconv weight: fan-in-ish normalized uniform
    fan = max(int(np.prod(shape[1:])), 1)
    bound = 1.0 / np.sqrt(fan)
    return ((r.rand(*shape) * 2.0 - 1.0) * bound).astype(np.float32)


def synth_state_dict(keyshapes):
    """keyshapes: {torch_key: shape list} -> {torch_key: np.ndarray}."""
    return {k: synth_value(k, s) for k, s in keyshapes.items()}
