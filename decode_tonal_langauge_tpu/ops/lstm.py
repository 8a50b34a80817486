"""Time-batched LSTM: scan only the recurrence, matmul everything else.

The reference's models embed ``torch.nn.LSTM`` layers whose final hidden
state feeds the downstream stack (``/root/reference/models/
deep_classifiers.py:252,262``, ``/root/reference/models/
synthesis_models.py:120-128,232-238``). A direct JAX translation —
``nn.RNN(nn.OptimizedLSTMCell(H))`` differentiated with ``jax.grad`` —
is badly memory-bound on TPU for wide cells: the VJP of ``lax.scan``
carries the weight-gradient accumulator THROUGH the backward scan, so
every timestep reads and writes the full ``(H, 4H)`` recurrent-kernel
gradient in f32. For the paper synthesis model's 2640..5520-wide label
LSTM that is ~100-450 MB of HBM traffic per dynamics step — the entire
train-step budget (measured 79 ms/step at batch 32, ~0.06 MFU).

This op restructures the computation so the MXU sees large batched
matmuls and the scan carries only ``(h, c)``:

- forward: the input projection ``x @ W_i`` for ALL timesteps is one
  ``(B*T, I) @ (I, 4H)`` matmul hoisted out of the scan; the scan body
  is a single ``(B, H) @ (H, 4H)`` matmul plus elementwise gates.
- backward (``jax.custom_vjp``): a reverse scan propagates only the
  per-step gate deltas ``da_t`` (carry = ``dh, dc`` — 2·B·H floats, no
  weight accumulator); the weight gradients are then formed AFTER the
  scan as two time-batched matmuls ``dW_h = h_prev^T @ da`` and
  ``dW_i = x^T @ da`` over the stacked ``(T*B, 4H)`` deltas, and
  ``dx = da @ W_i^T`` as one more. Accumulation precision is f32
  (``preferred_element_type``) regardless of the compute dtype.

Gate math matches ``flax.linen.OptimizedLSTMCell`` exactly (sigmoid
i/f/o, tanh g, bias on the hidden projection only, f-gate order
i, f, g, o), verified to ~1e-6 against ``nn.RNN(OptimizedLSTMCell)``
in ``tests/test_ops_lstm.py`` for values and all gradients.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn
from flax.linen import initializers


def _lstm_scan(xg, h0, c0, wh):
    """Forward recurrence. xg: (T, B, 4H) precomputed input projections
    (+ bias); returns stacked h (T, B, H) and the gate/cell residuals."""

    def body(carry, xg_t):
        h, c = carry
        gates = xg_t + h @ wh
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        i = jax.nn.sigmoid(i)
        f = jax.nn.sigmoid(f)
        g = jnp.tanh(g)
        o = jax.nn.sigmoid(o)
        c_new = f * c + i * g
        h_new = o * jnp.tanh(c_new)
        return (h_new, c_new), (h_new, c_new, i, f, g, o)

    (h_last, c_last), (hs, cs, i_, f_, g_, o_) = jax.lax.scan(
        body, (h0, c0), xg
    )
    return (h_last, c_last), (hs, cs, i_, f_, g_, o_)


@jax.custom_vjp
def lstm_sequence(x, h0, c0, wi, wh, b):
    """Run an LSTM over ``x`` (B, T, I); returns the hidden sequence
    (B, T, H). Weights are the concatenated-gate kernels:
    ``wi`` (I, 4H) bias-free, ``wh`` (H, 4H), ``b`` (4H,), gate order
    i, f, g, o (the ``OptimizedLSTMCell`` convention)."""
    xg = jnp.einsum("bti,ih->bth", x, wi) + b
    xg = jnp.transpose(xg, (1, 0, 2))  # (T, B, 4H)
    (_, _), (hs, _, _, _, _, _) = _lstm_scan(xg, h0, c0, wh)
    return jnp.transpose(hs, (1, 0, 2))


def _lstm_fwd(x, h0, c0, wi, wh, b):
    xg = jnp.einsum("bti,ih->bth", x, wi) + b
    xg = jnp.transpose(xg, (1, 0, 2))
    (_, _), (hs, cs, i_, f_, g_, o_) = _lstm_scan(xg, h0, c0, wh)
    return (
        jnp.transpose(hs, (1, 0, 2)),
        (x, h0, c0, wi, wh, hs, cs, i_, f_, g_, o_),
    )


def _lstm_bwd(res, dhs):
    x, h0, c0, wi, wh, hs, cs, i_, f_, g_, o_ = res
    # Residuals are stacked time-major: (T, B, H).
    dhs = jnp.transpose(dhs, (1, 0, 2))

    # Per-step previous state: shift the stacked outputs by one.
    h_prev = jnp.concatenate([h0[None], hs[:-1]], axis=0)
    c_prev = jnp.concatenate([c0[None], cs[:-1]], axis=0)

    def body(carry, step):
        dh_next, dc_next = carry
        dh_out, c_t, cp, i, f, g, o = step
        dh = dh_out + dh_next
        tc = jnp.tanh(c_t)
        dc = dh * o * (1.0 - tc * tc) + dc_next
        # Pre-activation gate deltas.
        dai = dc * g * i * (1.0 - i)
        daf = dc * cp * f * (1.0 - f)
        dag = dc * i * (1.0 - g * g)
        dao = dh * tc * o * (1.0 - o)
        da = jnp.concatenate([dai, daf, dag, dao], axis=-1)  # (B, 4H)
        dh_prev = da @ wh.T
        dc_prev = dc * f
        return (dh_prev, dc_prev), da

    (dh0, dc0), das = jax.lax.scan(
        body,
        (jnp.zeros_like(h0), jnp.zeros_like(c0)),
        (dhs, cs, c_prev, i_, f_, g_, o_),
        reverse=True,
    )

    t, bsz, h4 = das.shape
    da_flat = das.reshape(t * bsz, h4)
    hp_flat = h_prev.reshape(t * bsz, -1)
    # Weight grads as single time-batched matmuls, f32 accumulation.
    dwh = jax.lax.dot(
        hp_flat.T, da_flat, preferred_element_type=jnp.float32
    ).astype(wh.dtype)
    x_flat = jnp.transpose(x, (1, 0, 2)).reshape(t * bsz, -1)
    dwi = jax.lax.dot(
        x_flat.T, da_flat, preferred_element_type=jnp.float32
    ).astype(wi.dtype)
    db = jnp.sum(
        da_flat, axis=0, dtype=jnp.float32
    ).astype(da_flat.dtype)  # f32 accumulation, like dwh/dwi
    dx = jnp.transpose(
        das @ wi.T, (1, 0, 2)
    )  # (T,B,4H)@(4H,I) -> (B,T,I)
    return dx, dh0, dc0, dwi, dwh, db


lstm_sequence.defvjp(_lstm_fwd, _lstm_bwd)


class _GateParams(nn.Module):
    """Parameter holder replicating one OptimizedLSTMCell gate dense
    (kernel + optional bias) so checkpoints/param trees stay
    interchangeable with ``nn.RNN(nn.OptimizedLSTMCell(H))``."""

    features: int
    in_features: int
    use_bias: bool
    kernel_init: Any
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self):
        kernel = self.param(
            "kernel",
            self.kernel_init,
            (self.in_features, self.features),
            self.param_dtype,
        )
        if self.use_bias:
            bias = self.param(
                "bias", initializers.zeros_init(), (self.features,),
                self.param_dtype,
            )
        else:
            bias = None
        return kernel, bias


class _Cell(nn.Module):
    """Groups the eight gate denses under the scope name ``cell`` with
    OptimizedLSTMCell's exact parameter names and initializers."""

    features: int
    in_features: int

    @nn.compact
    def __call__(self):
        h = self.features
        wis, whs, bs = [], [], []
        for gate in ("i", "f", "g", "o"):
            wi, _ = _GateParams(
                h, self.in_features, use_bias=False,
                kernel_init=initializers.lecun_normal(),
                name=f"i{gate}",
            )()
            wh, b = _GateParams(
                h, h, use_bias=True,
                kernel_init=initializers.orthogonal(),
                name=f"h{gate}",
            )()
            wis.append(wi)
            whs.append(wh)
            bs.append(b)
        return (
            jnp.concatenate(wis, axis=-1),
            jnp.concatenate(whs, axis=-1),
            jnp.concatenate(bs, axis=-1),
        )


class TimeBatchedLSTM(nn.Module):
    """Drop-in replacement for ``nn.RNN(nn.OptimizedLSTMCell(features))``
    returning the full hidden sequence (B, T, features), with the
    time-batched custom-VJP compute path of :func:`lstm_sequence`.

    The parameter tree is identical to the Flax original
    (``cell/{ii,if,ig,io}/kernel``, ``cell/{hi,hf,hg,ho}/{kernel,bias}``),
    so swapping implementations does not invalidate checkpoints.
    ``dtype`` selects the compute precision (params stay f32); weight
    gradients always accumulate in f32.
    """

    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        bsz = x.shape[0]
        wi, wh, b = _Cell(
            self.features, x.shape[-1], name="cell"
        )()
        dt = self.dtype
        h0 = jnp.zeros((bsz, self.features), dtype=dt)
        out = lstm_sequence(
            x.astype(dt), h0, h0, wi.astype(dt), wh.astype(dt),
            b.astype(dt),
        )
        return out
