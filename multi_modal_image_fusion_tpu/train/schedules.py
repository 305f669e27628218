"""LR schedules matching the reference trainer:

- MultiStepLR at (2/3 E, 8/9 E) epochs, gamma 0.1 (reference train.py:148,
  320)
- optional iteration-level warmup over the first epoch with factor 0.001
  and method 'linear' or 'constant' (reference common.py:136-166,
  train.py:321-324, 78-79)

Expressed as a single optax-compatible step -> lr function (the reference
mutates optimizer state; we fold everything into a pure schedule). The
returned schedule also carries a `.host` twin — the same math in numpy —
so per-iteration lr logging (reference train.py:108-110) costs no device
dispatch.
"""

import jax.numpy as jnp
import numpy as np


def make_lr_schedule(base_lr, steps_per_epoch, num_epochs,
                     milestones=None, gamma=0.1,
                     warmup=False, warmup_factor=0.001,
                     warmup_iters=None, warmup_method="linear"):
    if milestones is None:
        milestones = (round(num_epochs * 2 / 3), round(num_epochs * 8 / 9))
    milestone_steps = jnp.array([m * steps_per_epoch for m in milestones])
    if warmup_iters is None:
        warmup_iters = steps_per_epoch
    if warmup_method not in ("constant", "linear"):
        raise ValueError("only supported ['constant', 'linear'] method")

    def _lr(step, xp, steps):
        lr = base_lr * gamma ** xp.sum(step >= steps)
        if warmup:
            if warmup_method == "constant":
                # reference common.py:160-161: flat warmup_factor until
                # warmup_iters, then full LR
                factor = xp.asarray(warmup_factor)
            else:
                alpha = xp.minimum(step / warmup_iters, 1.0)
                factor = warmup_factor + (1.0 - warmup_factor) * alpha
            lr = lr * xp.where(step < warmup_iters, factor, 1.0)
        return lr

    def schedule(step):
        return _lr(step, jnp, milestone_steps)

    schedule.host = lambda step: float(
        _lr(step, np, np.asarray(milestone_steps)))
    return schedule
