"""LR schedule: constant for ``niter`` epochs, then linear decay to 0 over
``niter_decay`` epochs — ``lr -= lr0/niter_decay`` each epoch past niter
(SURVEY.md §3.2 Optimizers / C12 update_learning_rate)."""

from __future__ import annotations

import jax.numpy as jnp


def linear_decay_schedule(lr0: float, niter: int, niter_decay: int, steps_per_epoch: int):
    def schedule(step):
        epoch = step // max(steps_per_epoch, 1)  # 0-indexed
        # reference decrements at the END of each epoch past niter, so
        # 1-indexed epoch niter+1 still runs at lr0 and epoch niter+2 runs
        # at lr0*(1 - 1/niter_decay): decay count = max(epoch0 - niter, 0).
        decay_epochs = jnp.maximum(epoch - niter, 0)
        lr = lr0 * (1.0 - decay_epochs.astype(jnp.float32) / max(niter_decay, 1))
        return jnp.maximum(lr, 0.0)

    return schedule
