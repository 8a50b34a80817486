"""Vectorized longest-consecutive-run computation.

Replaces the reference's Python segment walk
(``/root/reference/channel_selection/utils.py:4-31``) with a cumsum /
cumulative-max trick that runs for all channels at once.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


@jax.jit
def max_consecutive_true(mask: jax.Array) -> jax.Array:
    """Length of the longest run of True along the last axis.

    For each position, the running streak is ``cumsum(mask) - cumsum value at
    the most recent False``; the max streak over time is the answer.
    """
    mask = jnp.asarray(mask)
    x = mask.astype(jnp.int32)
    axis = x.ndim - 1  # lax.cummax requires a non-negative axis
    cs = jnp.cumsum(x, axis=axis)
    reset = jnp.where(mask, 0, cs)
    running_reset = jax.lax.cummax(reset, axis=axis)
    streak = cs - running_reset
    return streak.max(axis=axis)
