"""Optimizers: NAdam with decay/no-decay parameter groups.

The reference uses torch NAdam with weight decay applied only to
parameters of ndim >= 2 (``/root/reference/models/utils.py:5-18``,
``classifier_trainer.py:63-74``). Here that split is an Optax mask.

``moment_dtype`` stores the optimizer moments (mu AND nu) in a reduced
dtype at rest while the update math stays f32: one NAdam step streams
read p/mu/nu/g + write p/mu/nu through HBM, so for large models the
optimizer is a pure bandwidth floor (measured ~5 ms of the 102 M-param
SynthesisModelCNN's 22.5 ms f32 step — PROFILE.md). bf16 moments halve
the mu/nu share of that traffic and the checkpoint/HBM footprint of the
train state; bf16 keeps f32's exponent range, so only mantissa
precision is lost (quality parity asserted in tests/test_training.py
and the e2e config test).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import optax


def decay_mask(params) -> object:
    """True for parameters that receive weight decay (ndim >= 2)."""
    return jax.tree_util.tree_map(lambda p: p.ndim >= 2, params)


def _cast_floats(tree, dtype):
    """Cast every floating leaf of an optimizer-state tree; counts and
    other integer bookkeeping pass through untouched."""
    return jax.tree_util.tree_map(
        lambda x: x.astype(dtype)
        if jnp.issubdtype(jnp.asarray(x).dtype, jnp.floating)
        else x,
        tree,
    )


def with_moment_dtype(
    inner: optax.GradientTransformation, dtype
) -> optax.GradientTransformation:
    """Store ``inner``'s floating state in ``dtype``; update in f32.

    The cast pairs fuse into the update kernel (XLA reads/writes the
    reduced-precision buffers directly; the f32 intermediates live in
    registers), so HBM traffic and state footprint drop without a
    separate conversion pass. ``dtype=None`` returns ``inner``.
    """
    if dtype is None:
        return inner
    dtype = jnp.dtype(dtype)

    def init_fn(params):
        return _cast_floats(inner.init(params), dtype)

    def update_fn(updates, state, params=None):
        updates, new_state = inner.update(
            updates, _cast_floats(state, jnp.float32), params
        )
        return updates, _cast_floats(new_state, dtype)

    return optax.GradientTransformation(init_fn, update_fn)


def nadam_with_decay_groups(
    learning_rate: float,
    weight_decay: float = 0.0,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    moment_dtype: Optional[str] = None,
) -> optax.GradientTransformation:
    """NAdam; weight decay masked to ndim>=2 parameters."""
    if weight_decay:
        opt = optax.chain(
            optax.add_decayed_weights(weight_decay, mask=decay_mask),
            optax.nadam(learning_rate, b1=b1, b2=b2, eps=eps),
        )
    else:
        opt = optax.nadam(learning_rate, b1=b1, b2=b2, eps=eps)
    return with_moment_dtype(opt, moment_dtype)
