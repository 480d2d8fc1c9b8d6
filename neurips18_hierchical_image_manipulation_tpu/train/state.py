"""GAN train state: two optimizers (G, D) + step counter + PRNG key.

Reference contract: SURVEY.md §3.2 Optimizers — separate
``Adam(lr=2e-4, betas=(0.5, 0.999))`` for G and D; LR constant for niter
epochs then linear decay (see schedule.py). Unlike the reference, optimizer
state IS checkpointed (documented divergence, SURVEY.md §6.4: the
reference resets Adam moments on resume — a quirk we consciously fix).
"""

from __future__ import annotations

from typing import Any

import jax
import optax
from flax import struct


class GANTrainState(struct.PyTreeNode):
    step: Any
    params: Any  # {'G': ..., 'D': ...}
    opt_state_g: Any
    opt_state_d: Any
    rng: Any
    tx_g: optax.GradientTransformation = struct.field(pytree_node=False)
    tx_d: optax.GradientTransformation = struct.field(pytree_node=False)

    @classmethod
    def create(cls, params, tx_g, tx_d, rng):
        g_side = {k: v for k, v in params.items() if k != "D"}
        return cls(
            step=jax.numpy.zeros((), jax.numpy.int32),
            params=params,
            opt_state_g=tx_g.init(g_side),
            opt_state_d=tx_d.init(params["D"]),
            rng=rng,
            tx_g=tx_g,
            tx_d=tx_d,
        )

    def apply_gradients(self, grads):
        """optimizer_G covers every non-D subtree (G + the instance-feature
        Encoder E when present — pix2pixHD trains E jointly with G);
        optimizer_D covers D."""
        g_params = {k: v for k, v in self.params.items() if k != "D"}
        g_grads = {k: v for k, v in grads.items() if k != "D"}
        upd_g, new_og = self.tx_g.update(g_grads, self.opt_state_g, g_params)
        upd_d, new_od = self.tx_d.update(grads["D"], self.opt_state_d, self.params["D"])
        new_params = dict(optax.apply_updates(g_params, upd_g))
        new_params["D"] = optax.apply_updates(self.params["D"], upd_d)
        return self.replace(
            step=self.step + 1,
            params=new_params,
            opt_state_g=new_og,
            opt_state_d=new_od,
        )


def _freeze_paths_until(threshold_steps: int, match: str):
    """optax wrapper: zero the updates of params whose path contains
    ``match`` while the internal step count is below ``threshold_steps``
    — implements the reference's --niter_fix_global (train only the local
    enhancer branch first, SURVEY.md §3.3/C15)."""
    import jax
    import jax.numpy as jnp

    def init(params):
        return jnp.zeros((), jnp.int32)

    def update(updates, state, params=None):
        def mask(path, u):
            keys = "/".join(str(getattr(k, "key", k)) for k in path)
            if match in keys:
                keep = (state >= threshold_steps).astype(u.dtype)
                return u * keep
            return u

        new_updates = jax.tree_util.tree_map_with_path(mask, updates)
        return new_updates, state + 1

    return optax.GradientTransformation(init, update)


def make_optimizers(opt, steps_per_epoch: int):
    """Adam pair with the reference's LR schedule baked in as an optax
    schedule over *steps* (the reference decays per epoch — identical
    piecewise-constant values when steps_per_epoch matches). When
    ``niter_fix_global`` > 0 and netG is the LocalEnhancer, the global
    trunk's updates are zeroed for the first niter_fix_global epochs."""
    from .schedule import linear_decay_schedule

    sched = linear_decay_schedule(opt.lr, opt.niter, opt.niter_decay, steps_per_epoch)
    tx_g = optax.adam(sched, b1=opt.beta1, b2=0.999)
    if getattr(opt, "niter_fix_global", 0) > 0 and getattr(opt, "netG", "") == "local":
        tx_g = optax.chain(
            tx_g,
            _freeze_paths_until(opt.niter_fix_global * steps_per_epoch, "global"),
        )
    tx_d = optax.adam(sched, b1=opt.beta1, b2=0.999)
    return tx_g, tx_d
