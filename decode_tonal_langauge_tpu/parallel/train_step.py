"""Sharded training steps: DP over the batch axis + optional model-parallel
sharding of wide dense layers.

The classifier's FLOPs are dominated by the 512-wide conv stack and the
``256 * C * L' x 1024`` dense head (``models/deep.py``); under a
("data", "model") mesh the batch shards over ``data`` and the dense-head
kernels shard over ``model``, with XLA/GSPMD inserting the grad psum and
activation all-gathers.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def dense_head_sharding(mesh: Mesh, params, layer_names=("fc1", "fc2", "head")):
    """NamedSharding tree: dense-head kernels split on the ``model`` axis
    (output dim), everything else replicated."""
    if "model" not in mesh.axis_names:
        return jax.tree_util.tree_map(lambda _: NamedSharding(mesh, P()), params)

    def assign(path, leaf):
        names = [getattr(p, "key", getattr(p, "name", "")) for p in path]
        in_head = any(n in layer_names for n in names)
        is_kernel = names and names[-1] == "kernel"
        if in_head and is_kernel and leaf.ndim == 2:
            return NamedSharding(mesh, P(None, "model"))
        if in_head and names and names[-1] == "bias" and leaf.ndim == 1:
            return NamedSharding(mesh, P("model"))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(assign, params)


def build_sharded_classifier_step(
    model,
    optimizer: optax.GradientTransformation,
    mesh: Mesh,
    has_batch_stats: bool = False,
) -> Callable:
    """One jitted DP training step.

    Without batch stats: ``(params, opt_state, x, y, rng) -> (params,
    opt_state, loss)``. With ``has_batch_stats=True`` (BatchNorm models,
    e.g. ``SynthesisLite``-style stacks): ``(params, batch_stats,
    opt_state, x, y, rng) -> (params, batch_stats, opt_state, loss)``.

    The batch is constrained to shard over the mesh's ``data`` axis (so a
    mis-placed input is re-sharded instead of silently replicated); shard
    inputs with :func:`~..mesh.shard_batch` to avoid the transfer.
    """
    def constrain(x):
        spec = P("data", *([None] * (x.ndim - 1)))
        return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, spec))

    if has_batch_stats:

        def loss_fn(params, batch_stats, x, y, rng):
            out, updates = model.apply(
                {"params": params, "batch_stats": batch_stats},
                x,
                train=True,
                rngs={"dropout": rng},
                mutable=["batch_stats"],
            )
            ce = optax.softmax_cross_entropy_with_integer_labels(out, y).mean()
            return ce, updates["batch_stats"]

        @jax.jit
        def step(params, batch_stats, opt_state, x, y, rng):
            x, y = constrain(x), constrain(y)
            (loss, new_bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                params, batch_stats, x, y, rng
            )
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, new_bs, opt_state, loss

        return step

    def loss_fn(params, x, y, rng):
        out = model.apply(
            {"params": params}, x, train=True, rngs={"dropout": rng},
        )
        return optax.softmax_cross_entropy_with_integer_labels(out, y).mean()

    @jax.jit
    def step(params, opt_state, x, y, rng):
        x, y = constrain(x), constrain(y)
        loss, grads = jax.value_and_grad(loss_fn)(params, x, y, rng)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return step


def build_sharded_synthesis_step(
    model, optimizer: optax.GradientTransformation, mesh: Mesh
) -> Callable:
    """DP training step for a synthesis model on (ecog, labels, mel)."""

    def loss_fn(params, ecog, labels, targets, rng):
        out = model.apply(
            {"params": params}, ecog, labels, train=True, rngs={"dropout": rng},
        )
        return jnp.abs(out - targets).mean()

    @jax.jit
    def step(params, opt_state, ecog, labels, targets, rng):
        loss, grads = jax.value_and_grad(loss_fn)(params, ecog, labels, targets, rng)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return step
