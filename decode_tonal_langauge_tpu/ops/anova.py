"""Vectorized one-way ANOVA over (channel, time) grids.

The reference loops ``scipy.stats.f_oneway`` per channel
(``/root/reference/channel_selection/active.py:58-64``,
``discriminative.py:172-180``). Here the closed-form F statistic and its
p-value (regularized incomplete beta) are computed for every channel and
timepoint in one jitted reduction.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.scipy.special import betainc


def f_sf(f_stat: jax.Array, dfn: jax.Array, dfd: jax.Array) -> jax.Array:
    """Survival function of the F distribution: P(F > f).

    ``sf(f) = I_{dfd/(dfd + dfn*f)}(dfd/2, dfn/2)`` via the regularized
    incomplete beta function.
    """
    x = dfd / (dfd + dfn * f_stat)
    return betainc(dfd / 2.0, dfn / 2.0, x)


@jax.jit
def f_oneway_two_groups(
    a: jax.Array, b: jax.Array
) -> Tuple[jax.Array, jax.Array]:
    """One-way ANOVA of two sample groups at every trailing position.

    ``a``: (Na, ...), ``b``: (Nb, ...) — groups along axis 0 (trials).
    Returns (F, p) with shape ``a.shape[1:]``. Matches
    ``scipy.stats.f_oneway(a, b)``.
    """
    na, nb = a.shape[0], b.shape[0]
    n = na + nb
    mean_a = a.mean(axis=0)
    mean_b = b.mean(axis=0)
    grand = (na * mean_a + nb * mean_b) / n

    ssb = na * (mean_a - grand) ** 2 + nb * (mean_b - grand) ** 2
    ssw = ((a - mean_a) ** 2).sum(axis=0) + ((b - mean_b) ** 2).sum(axis=0)

    dfn = jnp.asarray(1.0, dtype=ssb.dtype)  # k - 1 with k = 2
    dfd = jnp.asarray(float(n - 2), dtype=ssb.dtype)
    f = (ssb / dfn) / (ssw / dfd)
    p = f_sf(f, dfn, dfd)
    return f, p


@partial(jax.jit, static_argnames=("n_groups",))
def f_oneway_labeled(
    x: jax.Array, labels: jax.Array, n_groups: int
) -> Tuple[jax.Array, jax.Array]:
    """One-way ANOVA grouping samples (axis 0) by integer ``labels``.

    ``x``: (N, ...), ``labels``: (N,) in [0, n_groups). Returns (F, p) with
    shape ``x.shape[1:]``. Matches ``scipy.stats.f_oneway(*groups)`` for the
    same partition.
    """
    n = x.shape[0]
    onehot = jax.nn.one_hot(labels, n_groups, dtype=x.dtype)  # (N, G)
    counts = onehot.sum(axis=0)  # (G,)

    flat = x.reshape(n, -1)  # (N, D)
    group_sums = onehot.T @ flat  # (G, D)
    safe_counts = jnp.maximum(counts, 1.0)
    group_means = group_sums / safe_counts[:, None]

    grand = flat.mean(axis=0)  # (D,)

    ssb = (counts[:, None] * (group_means - grand[None, :]) ** 2).sum(axis=0)
    # SSW from group-mean-centred residuals (avoids SST - SSB cancellation).
    residuals = flat - group_means[labels]
    ssw = (residuals ** 2).sum(axis=0)

    k = (counts > 0).sum().astype(flat.dtype)
    dfn = k - 1.0
    dfd = n - k
    f = (ssb / dfn) / (ssw / dfd)
    p = f_sf(f, dfn, dfd)

    out_shape = x.shape[1:]
    return f.reshape(out_shape), p.reshape(out_shape)
