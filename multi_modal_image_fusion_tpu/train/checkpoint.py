"""Checkpointing with the reference's best/last semantics
(reference train.py:362-383: `epoch_best` saved when valid loss improves
after the midpoint epoch, `epoch_last` always saved at the end) plus what the
reference lacks: full resume state (params + batch_stats + opt_state + step
+ epoch), via flax msgpack serialization.

The reference's DDP init-weight broadcast through a temp file
(train.py:286-294) has no TPU equivalent: same-seed init + replicated
sharding makes every device start from identical weights for free.
"""

import json
import os

import jax
from flax import serialization


def save_checkpoint(path, state, meta=None):
    """state: any pytree (e.g. TrainState). Writes <path> (msgpack) and
    <path>.json (metadata)."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    state = jax.device_get(state)
    with open(path, "wb") as f:
        f.write(serialization.to_bytes(state))
    if meta is not None:
        with open(path + ".json", "w") as f:
            json.dump(meta, f, indent=1)


def load_checkpoint(path, target):
    """Restore into a template pytree with identical structure."""
    with open(path, "rb") as f:
        data = f.read()
    return serialization.from_bytes(target, data)


def load_checkpoint_meta(path):
    meta_path = path + ".json"
    if os.path.isfile(meta_path):
        with open(meta_path) as f:
            return json.load(f)
    return {}


def merge_variables(init_vars, restored_vars):
    """strict=False restore (reference test.py:176): leaves present in
    the checkpoint override the freshly initialized tree; leaves the
    checkpoint lacks stay at init (e.g. fusion params when testing a
    stage-1 autoencoder checkpoint); checkpoint-only leaves are dropped.

    Both arguments are nested dict pytrees (flax variables or a single
    collection). Returns (merged, missing_paths, unexpected_paths)."""
    missing, unexpected = [], []

    def walk(init_t, rest_t, path):
        if not isinstance(init_t, dict):
            return rest_t
        out = {}
        rest_t = rest_t if isinstance(rest_t, dict) else {}
        for k, v in init_t.items():
            p = f"{path}/{k}" if path else k
            if k in rest_t:
                out[k] = walk(v, rest_t[k], p)
            else:
                missing.append(p)
                out[k] = v
        for k in rest_t:
            if k not in init_t:
                unexpected.append(f"{path}/{k}" if path else k)
        return out

    return walk(init_vars, restored_vars, ""), missing, unexpected
