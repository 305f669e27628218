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
