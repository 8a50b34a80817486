"""Re-referencing / normalisation ops: CAR, interval z-score, channel
z-score, rolling-window z-score.

All are jitted elementwise/reduction kernels over (C, T) arrays; XLA fuses
them into neighbouring ops. Reference behaviours:
- CAR: ``/root/reference/preprocess/signal/car_rereference.py:5-41``
- interval z-score: ``zscore_rereference.py:6-70``
- channel z-score: ``channel_zscore.py:5-29``
- rolling z-score (pandas ``rolling(min_periods=1).mean/std`` parity):
  ``rolling_zscore.py:5-49``
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Sequence

import jax
import jax.numpy as jnp


@jax.jit
def _car(data: jax.Array, include_mask: jax.Array) -> jax.Array:
    weights = include_mask.astype(data.dtype)
    common = (weights[:, None] * data).sum(axis=0, keepdims=True) / weights.sum()
    return data - common


def car_rereference(
    data: jax.Array, exclude_channels: Optional[Sequence[int]] = None
) -> jax.Array:
    """Common-average referencing; excluded channels don't enter the mean
    but are still re-referenced (reference semantics)."""
    n_channels = data.shape[0]
    exclude_channels = list(exclude_channels or [])
    if any(ch < 0 or ch >= n_channels for ch in exclude_channels):
        raise ValueError("exclude_channels contains invalid channel indices.")
    mask = jnp.ones((n_channels,), dtype=bool)
    if exclude_channels:
        mask = mask.at[jnp.asarray(exclude_channels)].set(False)
    return _car(data, mask)


@partial(jax.jit, static_argnames=("start", "end"))
def interval_zscore(data: jax.Array, start: int, end: int) -> jax.Array:
    """Z-score each channel by the mean/std of ``data[:, start:end]``.

    Population std (ddof=0), matching ``np.std`` in the reference.
    """
    ref = data[:, start:end]
    mean = ref.mean(axis=1, keepdims=True)
    std = ref.std(axis=1, keepdims=True)
    return (data - mean) / std


@partial(jax.jit, static_argnames=("fill_nans",))
def channel_zscore(data: jax.Array, fill_nans: bool = False) -> jax.Array:
    """Global per-channel z-score; optionally zero-fill NaNs."""
    mean = data.mean(axis=-1, keepdims=True)
    std = data.std(axis=-1, keepdims=True)
    z = (data - mean) / std
    if fill_nans:
        z = jnp.where(jnp.isnan(z), 0.0, z)
    return z


@partial(jax.jit, static_argnames=("window_size", "fill_nans"))
def rolling_zscore(
    data: jax.Array, window_size: int, fill_nans: bool = False
) -> jax.Array:
    """Trailing rolling-window z-score with pandas semantics.

    ``pandas.DataFrame.rolling(window, min_periods=1)``: at time t the window
    covers ``[max(0, t-w+1), t]``; mean uses the actual count; std uses
    ``ddof=1`` and is NaN when only one sample is in the window (t=0), which
    propagates into a NaN z-score unless ``fill_nans``.

    Rolling sums come from cumulative-sum differences; per-channel mean
    subtraction first keeps float32 accumulation well conditioned.
    """
    if window_size <= 1:
        raise ValueError("window_size must be greater than 1.")

    t = data.shape[-1]
    center = data.mean(axis=-1, keepdims=True)
    x = (data - center).astype(jnp.float32)

    cs1 = jnp.cumsum(x, axis=-1)
    cs2 = jnp.cumsum(x * x, axis=-1)

    # Trailing-window sums: s[t] = cs[t] - cs[t - w] (0 before the window fills).
    def shifted(cs):
        if t > window_size:
            pad = jnp.zeros_like(cs[..., :window_size])
            return jnp.concatenate([pad, cs[..., : t - window_size]], axis=-1)
        return jnp.zeros_like(cs)

    s1 = cs1 - shifted(cs1)
    s2 = cs2 - shifted(cs2)

    counts = jnp.minimum(jnp.arange(1, t + 1), window_size).astype(jnp.float32)
    mean = s1 / counts
    # Sample variance (ddof=1); guard the count-1 positions.
    denom = jnp.maximum(counts - 1.0, 1.0)
    var = jnp.maximum(s2 - s1 * s1 / counts, 0.0) / denom
    std = jnp.sqrt(var)
    std = jnp.where(counts > 1.5, std, jnp.nan)

    z = (x - mean) / std
    if fill_nans:
        z = jnp.where(jnp.isnan(z), 0.0, z)
    return z.astype(data.dtype)
