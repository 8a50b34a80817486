"""Optimizers: NAdam with decay/no-decay parameter groups.

The reference uses torch NAdam with weight decay applied only to
parameters of ndim >= 2 (``/root/reference/models/utils.py:5-18``,
``classifier_trainer.py:63-74``). Here that split is an Optax mask.
"""

from __future__ import annotations

import jax
import optax


def decay_mask(params) -> object:
    """True for parameters that receive weight decay (ndim >= 2)."""
    return jax.tree_util.tree_map(lambda p: p.ndim >= 2, params)


def nadam_with_decay_groups(
    learning_rate: float,
    weight_decay: float = 0.0,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
) -> optax.GradientTransformation:
    """NAdam; weight decay masked to ndim>=2 parameters."""
    if weight_decay:
        return optax.chain(
            optax.add_decayed_weights(weight_decay, mask=decay_mask),
            optax.nadam(learning_rate, b1=b1, b2=b2, eps=eps),
        )
    return optax.nadam(learning_rate, b1=b1, b2=b2, eps=eps)
