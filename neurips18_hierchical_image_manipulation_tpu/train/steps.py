"""The jitted GAN train step — single-device and shard_map DP variants.

One pure function computes BOTH gradients at the same (θG, θD) and applies
both optimizer updates — the exact semantics of the reference's
loss_G.backward(); step(); loss_D.backward(); step() sequence (gradients
are all evaluated before either step; see models/pix2pixhd.py docstring).

DP (SURVEY.md §3.5 / §6.8): the step is wrapped in ``jax.shard_map`` over a
1-D ``Mesh('data')``; per-device gradients are ``lax.psum``-averaged over
ICI before the optimizer update — params stay replicated, batch is sharded
on axis 0. BASELINE.json:5 "data-parallel ICI gradient allreduce".
"""

from __future__ import annotations

import functools
import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _cast_floats(tree, dtype):
    def cast(x):
        if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating):
            return x.astype(dtype)
        return x

    return jax.tree.map(cast, tree)


# batch keys holding pixel COORDINATES (integers stored as f32): excluded
# from the compute-dtype cast — bf16's ulp is 2 in [256,512) and 4 in
# [512,1024), so casting would shift box edges by pixels and desync the
# masked-RGB conditioning from the GT box (and from f32 inference)
_COORD_KEYS = frozenset({"boxes"})


def _cast_batch(batch, dtype):
    return {
        k: (v if k in _COORD_KEYS else _cast_floats(v, dtype))
        for k, v in batch.items()
    }


def _make_loss_fn(model, vgg_params, compute_dtype):
    """Mixed-precision GAN objective: master params stay fp32; under a bf16
    policy params+batch are cast at the step boundary so every conv runs
    bf16 on the MXU. The cast is differentiable, so jax.grad returns fp32
    gradients at the master params (bf16 GAN training needs no loss
    scaling — bf16 keeps fp32's exponent range)."""

    wants_rng = callable(getattr(model, "wants_rng", None)) and model.wants_rng()

    def loss_fn(params, batch, rng=None):
        if compute_dtype is not None and compute_dtype != jnp.float32:
            params = _cast_floats(params, compute_dtype)
            batch = _cast_batch(batch, compute_dtype)
            vgg = _cast_floats(vgg_params, compute_dtype) if vgg_params else None
        else:
            vgg = vgg_params
        kw = {"rng": rng} if wants_rng else {}
        total, (metrics, fake) = model.losses(params, batch, vgg_params=vgg, **kw)
        metrics = jax.tree.map(lambda m: jnp.asarray(m, jnp.float32), metrics)
        return jnp.asarray(total, jnp.float32), (metrics, fake)

    return loss_fn


def make_train_step(model, vgg_params=None, donate=True, compute_dtype=None):
    """Single-device jitted step: (state, batch) -> (state, metrics, fake)."""

    loss_fn = _make_loss_fn(model, vgg_params, compute_dtype)

    @functools.partial(jax.jit, donate_argnums=(0,) if donate else ())
    def step(state, batch):
        rng, sub = jax.random.split(state.rng)
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        (_, (metrics, fake)), grads = grad_fn(state.params, batch, sub)
        new_state = state.apply_gradients(grads).replace(rng=rng)
        return new_state, metrics, fake

    return step


def make_resident_train_step(
    model,
    sample_fn,
    n_samples,
    batch_size,
    vgg_params=None,
    compute_dtype=None,
    shuffle=True,
    seed=0,
    extra=None,
    donate=True,
):
    """Device-resident FUSED step: sampling + augmentation + model step in
    ONE jitted program with ZERO per-step host->device transfer
    (VERDICT r3 next#1: the 11-15%% loop-vs-device gap was dispatch +
    index-upload overhead around the separate _sample_batch program).

    The epoch permutation is generated ON DEVICE from ``state.step``:
      epoch, i = divmod(step, steps_per_epoch)           # device scalars
      perm     = random.permutation(fold_in(shuffle_key, epoch), n)
      idx      = dynamic_slice(perm, i * bs, bs)
    so the host's entire per-iteration work is one dispatch of the
    donated step with constant args. Sampling is a pure function of
    (seed, state.step): mid-epoch resume restores state.step from the
    checkpoint and the stream continues exactly (stronger than the host
    loader, whose RNG chain is not checkpointed). Same draw laws as the
    host/resident loaders (uniform crop, fair-coin flip, fair shuffle) on
    a different RNG stream — the documented resident-mode contract.

    Returns step(state, data) -> (state, metrics, fake) and
    step_with_batch(state, data) -> (state, metrics, fake, batch) — the
    latter compiled separately, for display iterations that need the
    input planes for the HTML gallery.
    """
    loss_fn = _make_loss_fn(model, vgg_params, compute_dtype)
    extra = dict(extra) if extra else {}
    steps_per_epoch = max(n_samples // batch_size, 1)  # drop_last, as the loaders do
    shuffle_key = jax.random.PRNGKey(seed ^ 0x5EED)
    sample_key = jax.random.PRNGKey(seed ^ 0xA3C0)

    def body(state, data):
        rng, sub = jax.random.split(state.rng)
        epoch = state.step // steps_per_epoch
        i = state.step % steps_per_epoch
        if shuffle:
            perm = jax.random.permutation(
                jax.random.fold_in(shuffle_key, epoch), n_samples
            )
        else:
            perm = jnp.arange(n_samples)
        idx = lax.dynamic_slice(perm, (i * batch_size,), (batch_size,))
        skey = jax.random.fold_in(sample_key, state.step)
        batch = dict(sample_fn(data, idx, skey))
        batch.update(extra)
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        (_, (metrics, fake)), grads = grad_fn(state.params, batch, sub)
        new_state = state.apply_gradients(grads).replace(rng=rng)
        return new_state, metrics, fake, batch

    donate_args = (0,) if donate else ()

    @functools.partial(jax.jit, donate_argnums=donate_args)
    def step(state, data):
        new_state, metrics, fake, _ = body(state, data)
        return new_state, metrics, fake

    @functools.partial(jax.jit, donate_argnums=donate_args)
    def step_with_batch(state, data):
        return body(state, data)

    return step, step_with_batch


def make_resident_dp_train_step(
    model,
    mesh: Mesh,
    sample_fn,
    n_samples,
    batch_size,
    vgg_params=None,
    axis="data",
    compute_dtype=None,
    shuffle=True,
    seed=0,
    donate=True,
):
    """Data-parallel FUSED resident step: the multi-chip analogue of
    ``make_resident_train_step`` — resident planes REPLICATED over the
    mesh, each device gathers + augments ITS shard of the global batch
    inside shard_map, gradients pmean over ICI. Zero per-step H2D on
    every chip.

    Determinism contract: the epoch permutation derives from
    (seed, epoch) with the SAME key on every device, so the global batch
    for step k is identical to the single-device fused stream; device d
    takes rows [i*bs + d*bs_dev, ...). Augmentation draws fold in the
    device index so crop/flip decorrelate across shards (they draw from a
    different stream than single-device — the documented resident-mode
    contract). ``batch_size`` is GLOBAL and must divide by the mesh size.
    """
    axes = (axis,) if isinstance(axis, str) else tuple(axis)
    n_dev = 1
    for a in axes:
        n_dev *= mesh.shape[a]
    if batch_size % n_dev:
        raise ValueError(
            f"global batch {batch_size} not divisible by mesh size {n_dev}"
        )
    bs_dev = batch_size // n_dev
    steps_per_epoch = max(n_samples // batch_size, 1)
    shuffle_key = jax.random.PRNGKey(seed ^ 0x5EED)
    sample_key = jax.random.PRNGKey(seed ^ 0xA3C0)
    loss_fn = _make_loss_fn(model, vgg_params, compute_dtype)

    def device_step(state, data):
        rng, sub = jax.random.split(state.rng)
        didx = lax.axis_index(axes[0])
        for a in axes[1:]:
            didx = didx * mesh.shape[a] + lax.axis_index(a)
        epoch = state.step // steps_per_epoch
        i = state.step % steps_per_epoch
        if shuffle:
            perm = jax.random.permutation(
                jax.random.fold_in(shuffle_key, epoch), n_samples
            )
        else:
            perm = jnp.arange(n_samples)
        start = i * batch_size + didx * bs_dev
        idx = lax.dynamic_slice(perm, (start,), (bs_dev,))
        skey = jax.random.fold_in(
            jax.random.fold_in(sample_key, state.step), didx
        )
        batch = dict(sample_fn(data, idx, skey))
        sub = jax.random.fold_in(sub, didx)
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        (_, (metrics, fake)), grads = grad_fn(state.params, batch, sub)
        grads = lax.pmean(grads, axes)
        metrics = lax.pmean(metrics, axes)
        new_state = state.apply_gradients(grads).replace(rng=rng)
        return new_state, metrics, fake, batch

    sharded = jax.shard_map(
        device_step,
        mesh=mesh,
        in_specs=(P(), P()),  # state AND resident planes replicated
        out_specs=(P(), P(), P(axes), P(axes)),
        check_vma=False,
    )
    donate_args = (0,) if donate else ()

    @functools.partial(jax.jit, donate_argnums=donate_args)
    def step(state, data):
        new_state, metrics, fake, _ = sharded(state, data)
        return new_state, metrics, fake

    @functools.partial(jax.jit, donate_argnums=donate_args)
    def step_with_batch(state, data):
        return sharded(state, data)

    return step, step_with_batch


def make_pooled_train_steps(model, vgg_params=None, compute_dtype=None):
    """pool_size>0 path (SURVEY.md C20): the reference feeds D a REPLAYED
    fake from the ImagePool while G trains against the fresh fake. Split
    into two jitted steps with the host-side pool between them:

      g_step(state, batch)            -> state', metrics_G, fake
      d_step(state, batch, fake_pool) -> state', metrics_D

    Semantics match the fused step when the pool is passthrough."""

    def cast_in(params, batch, vgg):
        if compute_dtype is not None and compute_dtype != jnp.float32:
            params = _cast_floats(params, compute_dtype)
            batch = _cast_batch(batch, compute_dtype)
            vgg = _cast_floats(vgg, compute_dtype) if vgg else None
        return params, batch, vgg

    @jax.jit
    def g_step(state, batch):
        # Gradients/updates run over the SAME g-side tree shape that
        # GANTrainState.create used to init opt_state_g ({'G': ..., 'E': ...}
        # — every non-D subtree), so stateful optimizers (Adam) see a
        # matching pytree and the instance-feature Encoder trains too.
        g_side = {k: v for k, v in state.params.items() if k != "D"}
        rng, sub = jax.random.split(state.rng)
        wants_rng = callable(getattr(model, "wants_rng", None)) and model.wants_rng()

        import inspect

        supports_g_only = "g_only" in inspect.signature(model.losses).parameters

        def loss(pg_side):
            model_params = dict(pg_side)
            model_params["D"] = jax.tree.map(lax.stop_gradient, state.params["D"])
            params, b, vgg = cast_in(model_params, batch, vgg_params)
            kw = {"rng": sub} if wants_rng else {}
            if supports_g_only:
                # skip the D-side loss entirely — d_step recomputes it
                # against the pool-replayed fake anyway
                kw["g_only"] = True
            total, (metrics, fake) = model.losses(params, b, vgg_params=vgg, **kw)
            g_metrics = {k: v for k, v in metrics.items() if k.startswith("G")}
            g_total = sum(g_metrics.values())
            return jnp.asarray(g_total, jnp.float32), (metrics, fake)

        grads, (metrics, fake) = jax.grad(loss, has_aux=True)(g_side)
        upd, new_og = state.tx_g.update(grads, state.opt_state_g, g_side)
        import optax as _optax

        new_params = dict(_optax.apply_updates(g_side, upd))
        new_params["D"] = state.params["D"]
        return (
            state.replace(
                params=new_params, opt_state_g=new_og, step=state.step + 1, rng=rng
            ),
            metrics,
            fake,
        )

    @jax.jit
    def d_step(state, batch, fake_pool):
        def loss(pd):
            params, b, vgg = cast_in(
                {"G": state.params["G"], "D": pd}, batch, vgg_params
            )
            fp = (
                fake_pool.astype(compute_dtype)
                if compute_dtype is not None and compute_dtype != jnp.float32
                else fake_pool
            )
            total, metrics = model.d_losses(params, b, lax.stop_gradient(fp))
            return jnp.asarray(total, jnp.float32), metrics

        grads, metrics = jax.grad(loss, has_aux=True)(state.params["D"])
        upd, new_od = state.tx_d.update(grads, state.opt_state_d, state.params["D"])
        import optax as _optax

        new_params = dict(state.params)
        new_params["D"] = _optax.apply_updates(state.params["D"], upd)
        return state.replace(params=new_params, opt_state_d=new_od), metrics

    return g_step, d_step


def make_dp_train_step(
    model, mesh: Mesh, vgg_params=None, axis="data", compute_dtype=None
):
    """Data-parallel step over ``mesh``: batch sharded on axis 0, params
    replicated, gradient allreduce via lax.psum (mean) inside shard_map.

    ``axis`` may be a tuple of mesh axis names for multi-axis DP — e.g.
    ``('dcn', 'data')`` on a hybrid multi-slice mesh
    (parallel/mesh.make_hybrid_data_mesh): the batch shards over the
    product of the axes and XLA lowers the pmean to a hierarchical
    allreduce (ICI within a slice, DCN across)."""

    axes = (axis,) if isinstance(axis, str) else tuple(axis)
    loss_fn = _make_loss_fn(model, vgg_params, compute_dtype)

    def device_step(state, batch):
        rng, sub = jax.random.split(state.rng)
        # decorrelate per-device dropout masks; params/rng stay replicated
        idx = lax.axis_index(axes[0])
        for a in axes[1:]:
            idx = idx * mesh.shape[a] + lax.axis_index(a)
        sub = jax.random.fold_in(sub, idx)
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        (_, (metrics, fake)), grads = grad_fn(state.params, batch, sub)
        grads = lax.pmean(grads, axes)
        metrics = lax.pmean(metrics, axes)
        new_state = state.apply_gradients(grads).replace(rng=rng)
        return new_state, metrics, fake

    replicated = P()
    batch_sharded = P(axes)
    sharded_step = jax.shard_map(
        device_step,
        mesh=mesh,
        in_specs=(replicated, batch_sharded),
        out_specs=(replicated, replicated, batch_sharded),
        check_vma=False,
    )

    @functools.partial(jax.jit, donate_argnums=(0,))
    def step(state, batch):
        return sharded_step(state, batch)

    return step


def shard_batch(batch, mesh: Mesh, axis="data"):
    """Place a host batch onto the mesh, sharded along the batch axis
    (``axis`` may be a tuple of mesh axes, e.g. ('dcn', 'data'))."""
    axes = (axis,) if isinstance(axis, str) else tuple(axis)
    sharding = NamedSharding(mesh, P(axes))
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)


def replicate(tree, mesh: Mesh):
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)
