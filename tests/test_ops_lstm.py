"""Parity of the time-batched custom-VJP LSTM vs flax's reference RNN.

The op replaces ``nn.RNN(nn.OptimizedLSTMCell(H))`` inside the deep
classifiers and synthesis models (reference counterparts:
``/root/reference/models/deep_classifiers.py:252,262``,
``/root/reference/models/synthesis_models.py:120-128,232-238``), so it
must match values AND gradients, and keep the exact parameter tree.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from decode_tonal_langauge_tpu.ops.lstm import TimeBatchedLSTM, lstm_sequence


def _flax_rnn(features):
    return nn.RNN(nn.OptimizedLSTMCell(features))


@pytest.fixture(scope="module")
def shapes():
    return 4, 7, 5, 6  # batch, time, in_features, hidden


def test_param_tree_matches_flax(shapes):
    b, t, i, h = shapes
    x = jnp.zeros((b, t, i))
    ref = _flax_rnn(h).init(jax.random.key(0), x)["params"]
    ours = TimeBatchedLSTM(h).init(jax.random.key(0), x)["params"]
    ref_shapes = jax.tree.map(lambda a: a.shape, ref)
    our_shapes = jax.tree.map(lambda a: a.shape, ours)
    assert ref_shapes == our_shapes


def test_forward_matches_flax(shapes):
    b, t, i, h = shapes
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((b, t, i)).astype(np.float32))
    params = _flax_rnn(h).init(jax.random.key(1), x)
    ref = _flax_rnn(h).apply(params, x)
    ours = TimeBatchedLSTM(h).apply(params, x)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)


def test_gradients_match_flax(shapes):
    b, t, i, h = shapes
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((b, t, i)).astype(np.float32))
    # Cotangent through a realistic head: weighted sum of the LAST state
    # (how every model in this repo consumes the LSTM).
    w = jnp.asarray(rng.standard_normal((h,)).astype(np.float32))
    params = _flax_rnn(h).init(jax.random.key(2), x)

    def loss(module, p, xx):
        out = module.apply(p, xx)
        return jnp.sum(out[:, -1, :] * w) + 0.1 * jnp.sum(out**2)

    ref_g = jax.grad(lambda p, xx: loss(_flax_rnn(h), p, xx), argnums=(0, 1))(
        params, x
    )
    our_g = jax.grad(
        lambda p, xx: loss(TimeBatchedLSTM(h), p, xx), argnums=(0, 1)
    )(params, x)
    for rg, og in zip(jax.tree.leaves(ref_g), jax.tree.leaves(our_g)):
        np.testing.assert_allclose(np.asarray(og), np.asarray(rg),
                                   rtol=2e-4, atol=1e-5)


def test_gradients_match_numeric_raw_op():
    b, t, i, h = 2, 3, 2, 3
    rng = np.random.default_rng(3)
    with jax.enable_x64(True):
        _numeric_grad_check(rng, b, t, i, h)


def _numeric_grad_check(rng, b, t, i, h):
    arrs = [
        rng.standard_normal(s).astype(np.float64)
        for s in [(b, t, i), (b, h), (b, h), (i, 4 * h), (h, 4 * h), (4 * h,)]
    ]
    args = [jnp.asarray(a) for a in arrs]

    def f(*a):
        return jnp.sum(jnp.sin(lstm_sequence(*a)))

    an = jax.grad(f, argnums=tuple(range(6)))(*args)
    eps = 1e-6
    for k in range(6):
        flat = arrs[k].ravel()
        idx = rng.integers(flat.size)
        orig = flat[idx]
        flat[idx] = orig + eps
        up = float(f(*[jnp.asarray(a) for a in arrs]))
        flat[idx] = orig - eps
        dn = float(f(*[jnp.asarray(a) for a in arrs]))
        flat[idx] = orig
        num = (up - dn) / (2 * eps)
        np.testing.assert_allclose(np.asarray(an[k]).ravel()[idx], num,
                                   rtol=1e-4, atol=1e-6)


def test_mesh_sharded_batch_matches_single_device(shapes):
    """The custom-VJP LSTM must produce identical values and gradients
    when the batch axis is sharded over an 8-device data mesh (GSPMD
    partitions the batched matmuls; the recurrence carry shards too)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from decode_tonal_langauge_tpu.parallel.mesh import make_mesh

    b, t, i, h = 8, 6, 5, 4
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.standard_normal((b, t, i)).astype(np.float32))
    params = TimeBatchedLSTM(h).init(jax.random.key(0), x)

    def loss(p, xx):
        out = TimeBatchedLSTM(h).apply(p, xx)
        return jnp.sum(out[:, -1, :] ** 2)

    ref_val = loss(params, x)
    ref_gp, ref_gx = jax.grad(loss, argnums=(0, 1))(params, x)

    mesh = make_mesh(8, axis_names=("data",))
    xs = jax.device_put(x, NamedSharding(mesh, P("data", None, None)))
    ps = jax.device_put(params, NamedSharding(mesh, P()))
    val = jax.jit(loss)(ps, xs)
    gp, gx = jax.jit(jax.grad(loss, argnums=(0, 1)))(ps, xs)

    np.testing.assert_allclose(np.asarray(val), np.asarray(ref_val),
                               rtol=1e-5)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(ref_gx),
                               rtol=1e-4, atol=1e-6)
    for a, r in zip(jax.tree.leaves(gp), jax.tree.leaves(ref_gp)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(r),
                                   rtol=1e-4, atol=1e-6)


def test_bf16_dtype_path_runs_and_tracks_f32(shapes):
    b, t, i, h = shapes
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.standard_normal((b, t, i)).astype(np.float32))
    params = TimeBatchedLSTM(h).init(jax.random.key(0), x)
    f32 = TimeBatchedLSTM(h).apply(params, x)
    bf16 = TimeBatchedLSTM(h, dtype=jnp.bfloat16).apply(params, x)
    assert bf16.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(bf16, dtype=np.float32), np.asarray(f32), atol=0.05
    )
