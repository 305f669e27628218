"""LR schedules matching the reference trainer:

- MultiStepLR at (2/3 E, 8/9 E) epochs, gamma 0.1 (reference train.py:148,
  320)
- optional iteration-level warmup over the first epoch with factor 0.001
  and method 'linear' or 'constant' (reference common.py:136-166,
  train.py:321-324, 78-79)

Expressed as a single optax-compatible step -> lr function (the reference
mutates optimizer state; we fold everything into a pure schedule).
"""

import jax.numpy as jnp


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

    def schedule(step):
        lr = base_lr * gamma ** jnp.sum(step >= milestone_steps)
        if warmup:
            if warmup_method == "constant":
                # reference common.py:160-161: flat warmup_factor until
                # warmup_iters, then full LR
                factor = jnp.asarray(warmup_factor)
            else:
                alpha = jnp.minimum(step / warmup_iters, 1.0)
                factor = warmup_factor + (1.0 - warmup_factor) * alpha
            lr = lr * jnp.where(step < warmup_iters, factor, 1.0)
        return lr

    return schedule
