"""Ablation profile of the two laggard train steps (VERDICT r3 item 6).

jax.profiler traces don't cross this environment's tunneled backend, so
the breakdown comes from ablation timing instead: each branch of the
model is isolated into its own jitted train step (forward + backward +
NAdam update on that branch's params) and timed with the repo's honest
recipe (N steps inside one jit, scalar readback fence, tunnel overhead
subtracted). Reports per-branch time, FLOPs (XLA cost model), and the
roofline bound implied by the branch's weight traffic.

Writes the numbers used by PROFILE.md. Run on the real chip:

    python scripts/profile_steps.py
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, ".")

import bench  # noqa: E402  (repo-root import: timing helpers)


def _time_and_flops(step, args, n_runs=20):
    import jax
    import jax.numpy as jnp

    @jax.jit
    def run_n(*a):
        def body(carry, _):
            return step(*carry), None

        out, _ = jax.lax.scan(body, a, None, length=n_runs)

        def add(acc, leaf):
            if not jnp.issubdtype(leaf.dtype, jnp.number):
                return acc  # PRNG keys etc.
            return acc + leaf.sum().astype(jnp.float32)

        return jax.tree_util.tree_reduce(add, out, jnp.float32(0.0))

    per_step = bench._time_scanned_steps(run_n, args, n_runs)
    flops = bench._step_flops(lambda *a: step(*a), args)
    return per_step, flops


def profile_synthesis(batch=32, channels=40, n_timepoints=200,
                      n_dynamics=100, n_mel=128 * 20, dtype_name="float32"):
    import jax
    import jax.numpy as jnp
    import optax
    from flax import linen as nn

    from decode_tonal_langauge_tpu.models.synthesis import (
        SynthesisModelCNN,
        synthesis_cnn_latent_length,
    )
    from decode_tonal_langauge_tpu.ops.lstm import TimeBatchedLSTM
    from decode_tonal_langauge_tpu.training.optim import (
        nadam_with_decay_groups,
    )

    dtype = jnp.dtype(dtype_name)
    rng = np.random.default_rng(0)
    ecog = jnp.asarray(
        rng.standard_normal((batch, channels, n_timepoints)).astype(np.float32)
    )
    labels = jnp.asarray(
        rng.standard_normal((batch, 2, n_dynamics)).astype(np.float32)
    )
    mel = jnp.asarray(rng.standard_normal((batch, n_mel)).astype(np.float32))
    latent_len = synthesis_cnn_latent_length(n_timepoints)
    lstm_size = latent_len * channels * 6

    results = {}

    def train_step_of(model, inputs, out_like, **apply_kwargs):
        params = model.init(
            {"params": jax.random.key(0), "dropout": jax.random.key(1)},
            *inputs, **apply_kwargs,
        )["params"]
        opt = nadam_with_decay_groups(5e-4)
        opt_state = opt.init(params)

        def step(params, opt_state, key):
            key, dk = jax.random.split(key)

            def loss_fn(p):
                out = model.apply(
                    {"params": p}, *inputs, rngs={"dropout": dk},
                    **apply_kwargs,
                )
                return jnp.abs(out - out_like).mean()

            _, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state2 = opt.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state2, key

        args = (params, opt_state, jax.random.key(1))
        t, f = _time_and_flops(step, args)
        n_params = sum(
            np.size(l) for l in jax.tree_util.tree_leaves(params)
        )
        return t, f, n_params

    # ---- full model ----
    full = SynthesisModelCNN(
        output_dim=n_mel, n_channels=channels, n_timepoints=n_timepoints,
        dtype=dtype,
    )
    t, f, p = train_step_of(full, (ecog, labels), mel, train=True)
    results["full_step"] = dict(seconds=t, flops=f, params=p)

    # ---- ECoG conv branch only (LSTM replaced by a constant) ----
    from decode_tonal_langauge_tpu.ops.stencil import StencilConvPoolLeaky

    class EcogOnly(nn.Module):
        @nn.compact
        def __call__(self, e):
            # reproduce the ecog branch + concat convs + head with a
            # constant label latent: isolates conv/dense cost. Mirrors
            # the production model incl. the fused stencil block 0 and
            # the pool-before-activation order.
            b = e.shape[0]
            x = StencilConvPoolLeaky(
                512, kernel_size=3, pool=2, negative_slope=0.01,
                dtype=dtype,
            )(jnp.transpose(e, (0, 2, 1)))
            for i in range(1, 5):
                ch = [512, 512, 512, 256, 64][i]
                k = (3, 1) if i < 3 else (1, 1)
                x = nn.Conv(ch, kernel_size=k, padding="VALID", dtype=dtype)(x)
                if i != 4:
                    x = nn.max_pool(x, window_shape=(2, 1), strides=(2, 1))
                x = nn.leaky_relu(x, negative_slope=0.01)
            x = nn.Dropout(0.5)(x, deterministic=False)
            x2 = jnp.zeros((b, latent_len, channels, 6), dtype)
            y = jnp.concatenate([x, x2], axis=-1)
            for ch in [128, 128, 128, 128, 64]:
                y = nn.Conv(ch, kernel_size=(1, 1), dtype=dtype)(y)
                y = nn.leaky_relu(y, negative_slope=0.1)
            return nn.Dense(n_mel, dtype=dtype)(
                y.reshape((b, -1))
            ).astype(jnp.float32)

    t, f, p = train_step_of(EcogOnly(), (ecog,), mel)
    results["conv_and_head_step"] = dict(seconds=t, flops=f, params=p)

    # ---- label LSTM branch only ----
    class LstmOnly(nn.Module):
        @nn.compact
        def __call__(self, l):
            x2 = jnp.transpose(l, (0, 2, 1)).astype(dtype)
            h = TimeBatchedLSTM(lstm_size, dtype=dtype)(x2)[:, -1, :]
            return h.astype(jnp.float32)

    lstm_target = jnp.zeros((batch, lstm_size), jnp.float32)
    t, f, p = train_step_of(LstmOnly(), (labels,), lstm_target)
    results["lstm_step"] = dict(seconds=t, flops=f, params=p)

    # roofline: recurrent weight traffic per step (fwd reads W_hh+W_ih
    # per time step; the custom-VJP backward reads them again)
    bytes_per_el = 2 if dtype_name == "bfloat16" else 4
    w_bytes = (lstm_size + 2) * 4 * lstm_size * bytes_per_el
    traffic = 2 * n_dynamics * w_bytes  # fwd + bwd weight reads
    results["lstm_roofline"] = dict(
        weight_bytes=w_bytes,
        step_traffic_bytes=traffic,
        hbm_bound_s=traffic / 819e9,  # v5e HBM ~819 GB/s
    )
    return results


def profile_cnn(batch=32, channels=32, length=200, n_classes=4,
                dtype_name="float32"):
    import jax
    import jax.numpy as jnp
    import optax
    from flax import linen as nn

    from decode_tonal_langauge_tpu.models.deep import CNNClassifier
    from decode_tonal_langauge_tpu.training.optim import (
        nadam_with_decay_groups,
    )

    dtype = jnp.dtype(dtype_name)
    rng = np.random.default_rng(0)
    x = jnp.asarray(
        rng.standard_normal((batch, channels, length)).astype(np.float32)
    )
    y = jnp.asarray(rng.integers(0, n_classes, batch).astype(np.int32))

    model = CNNClassifier(
        input_channels=channels, input_length=length, n_classes=n_classes,
        dtype=dtype,
    )
    variables = model.init({"params": jax.random.key(0)}, x, train=False)
    params = variables["params"]
    has_bn = "batch_stats" in variables
    bs = variables.get("batch_stats", {})
    opt = nadam_with_decay_groups(5e-4)
    opt_state = opt.init(params)

    def step(params, bs, opt_state, key):
        key, dk = jax.random.split(key)

        def loss_fn(p):
            v = {"params": p}
            if has_bn:
                v["batch_stats"] = bs
            out, upd = model.apply(
                v, x, train=True, rngs={"dropout": dk},
                mutable=["batch_stats"] if has_bn else [],
            )
            ce = optax.softmax_cross_entropy_with_integer_labels(out, y)
            return ce.mean(), upd.get("batch_stats", bs)

        (_, bs2), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state2 = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), bs2, opt_state2, key

    args = (params, bs, opt_state, jax.random.key(1))
    t, f = _time_and_flops(step, args)
    return {"cnn_step": dict(seconds=t, flops=f)}


if __name__ == "__main__":
    import json

    out = {}
    for dt in ("float32", "bfloat16"):
        out[f"synthesis_{dt}"] = profile_synthesis(dtype_name=dt)
        out[f"cnn_{dt}"] = profile_cnn(dtype_name=dt)
    print(json.dumps(out, indent=2, default=float))
