"""Epoch extraction as batched on-device gathers.

Replaces the reference's per-trial Python slicing
(``/root/reference/data_loading/text_align.py:290-304``) with
``vmap(dynamic_slice)`` over trial start indices (window length is static
per subject: ``length * sf``).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("length",))
def extract_epochs(data: jax.Array, starts: jax.Array, length: int) -> jax.Array:
    """Slice windows ``[start, start+length)`` from (C, T) -> (N, C, length).

    ``starts`` may be traced; callers must guarantee
    ``start + length <= T`` (validated host-side before the call).
    """

    def one(start):
        return jax.lax.dynamic_slice_in_dim(data, start, length, axis=-1)

    return jax.vmap(one)(starts.astype(jnp.int32))


@partial(jax.jit, static_argnames=("length",))
def extract_epochs_1d(data: jax.Array, starts: jax.Array, length: int) -> jax.Array:
    """Same for a 1-D series: (T,) -> (N, length)."""

    def one(start):
        return jax.lax.dynamic_slice_in_dim(data, start, length, axis=-1)

    return jax.vmap(one)(starts.astype(jnp.int32))


def tile_rest_windows(rest_start: int, rest_end: int, length: int) -> jnp.ndarray:
    """Start indices of non-overlapping rest windows (host-side helper).

    Matches the reference's stepping loop that drops the final partial
    window (``text_align.py:331-337``).
    """
    starts = []
    for i in range(rest_start, rest_end, length):
        if i + length > rest_end:
            break
        starts.append(i)
    return jnp.asarray(starts, dtype=jnp.int32)
