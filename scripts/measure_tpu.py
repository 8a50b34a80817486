#!/usr/bin/env python
"""Measure this framework on the attached TPU for the BASELINE.json
configs, matching the workloads of ``scripts/measure_cpu_floor.py``.

Trainer fits are timed as real wall-clock (each epoch already ends in a
host readback of the loss, so the numbers are honest); pure-kernel
measurements loop inside one jit and fence with a scalar readback
(``block_until_ready`` returns early on the tunneled backend).

Prints a JSON dict; paste into BASELINE.md next to the CPU floors.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

N_TRIALS, N_CHANNELS, EPOCH_LEN = 96, 12, 160
N_SYLLABLES, N_TONES = 2, 4


def _data(seed=0):
    rng = np.random.default_rng(seed)
    x = rng.standard_normal((N_TRIALS, N_CHANNELS, EPOCH_LEN)).astype(np.float32)
    y_syll = rng.integers(0, N_SYLLABLES, N_TRIALS).astype(np.int32)
    y_tone = rng.integers(0, N_TONES, N_TRIALS).astype(np.int32)
    return x, y_syll, y_tone


def _fit_time(model, x, y, n_classes, epochs=60, batch_size=16):
    from decode_tonal_langauge_tpu.training.trainer import ClassifierTrainer

    def make():
        return ClassifierTrainer(
            model, n_classes=n_classes, batch_size=batch_size,
            max_epochs=epochs, patience=epochs, seed=0,
        )

    make().fit(x, y, x, y)  # compile (cached across equal-config trainers)
    trainer = make()
    t0 = time.perf_counter()
    trainer.fit(x, y, x, y)
    return time.perf_counter() - t0


def config1_logistic():
    from decode_tonal_langauge_tpu.models.simple import (
        LogisticRegressionClassifier,
    )

    x, y, _ = _data()
    model = LogisticRegressionClassifier(
        input_dim=N_CHANNELS * EPOCH_LEN, n_classes=N_SYLLABLES
    )
    return _fit_time(model, x, y, N_SYLLABLES)


def config1_logistic_seed_parallel(n_seeds: int = 10):
    """Config #1 the way the pipeline now runs it: all repeat seeds as
    ONE vmapped jit (training/seed_parallel.py). Returns (total_s,
    per_fit_s) — compare per_fit_s against the 0.196 s CPU floor."""
    from decode_tonal_langauge_tpu.models.simple import (
        LogisticRegressionClassifier,
    )
    from decode_tonal_langauge_tpu.training.seed_parallel import (
        SeedParallelTrainer,
    )

    x, y, _ = _data()
    model = LogisticRegressionClassifier(
        input_dim=N_CHANNELS * EPOCH_LEN, n_classes=N_SYLLABLES
    )
    seeds = list(range(n_seeds))
    xs = np.stack([x] * n_seeds)
    ys = np.stack([y] * n_seeds)

    def run():
        spt = SeedParallelTrainer(
            model, n_classes=N_SYLLABLES, seeds=seeds,
            batch_size=16, max_epochs=60, patience=60,
        )
        return spt.fit_eval(xs, ys, xs, ys, xs, ys)

    run()  # compile
    t0 = time.perf_counter()
    run()
    total = time.perf_counter() - t0
    return total, total / n_seeds


def config2_anova_and_mlp():
    import jax
    import jax.numpy as jnp

    from decode_tonal_langauge_tpu.models.simple import ShallowNNClassifier
    from decode_tonal_langauge_tpu.ops.anova import f_oneway_labeled

    x, _, y = _data()
    xd, yd = jnp.asarray(x), jnp.asarray(y)

    reps = 50

    @jax.jit
    def anova_n(x, y):
        def body(i, acc):
            _, p = f_oneway_labeled(x * (1 + 1e-6 * i), y, n_groups=N_TONES)
            return acc + p.sum()
        return jax.lax.fori_loop(0, reps, body, jnp.float32(0.0))

    float(anova_n(xd, yd))  # compile
    t0 = time.perf_counter()
    float(anova_n(xd, yd))
    anova_s = (time.perf_counter() - t0) / reps

    model = ShallowNNClassifier(
        input_dim=N_CHANNELS * EPOCH_LEN, n_classes=N_TONES
    )
    return anova_s, _fit_time(model, x, y, N_TONES)


def config4_synthesis_step():
    """Jitted SynthesisLite train-step time (batch 32), matching the
    torch-CPU measurement's shapes."""
    import jax
    import jax.numpy as jnp
    import optax

    from decode_tonal_langauge_tpu.models.synthesis import SynthesisLite
    from decode_tonal_langauge_tpu.training.optim import (
        nadam_with_decay_groups,
    )

    n, c, t, out_dim, n_dyn = 32, 8, EPOCH_LEN, 1024, 16
    rng = np.random.default_rng(0)
    ecog = jnp.asarray(rng.standard_normal((n, c, t)).astype(np.float32))
    labels = jnp.asarray(rng.standard_normal((n, 2, n_dyn)).astype(np.float32))
    target = jnp.asarray(rng.standard_normal((n, out_dim)).astype(np.float32))

    model = SynthesisLite(output_dim=out_dim, n_channels=c, n_timepoints=t)
    variables = model.init(
        {"params": jax.random.key(0)}, ecog, labels, train=False
    )
    params, batch_stats = variables["params"], variables["batch_stats"]
    optimizer = nadam_with_decay_groups(5e-4)
    opt_state = optimizer.init(params)

    def one_step(carry, _):
        params, batch_stats, opt_state = carry

        def loss_fn(p, bs):
            out, updates = model.apply(
                {"params": p, "batch_stats": bs}, ecog, labels, train=True,
                rngs={"dropout": jax.random.key(1)},
                mutable=["batch_stats"],
            )
            return jnp.abs(out - target).mean(), updates["batch_stats"]

        (loss, new_bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, batch_stats
        )
        updates, opt_state = optimizer.update(grads, opt_state, params)
        return (optax.apply_updates(params, updates), new_bs, opt_state), loss

    reps = 50

    @jax.jit
    def run_n(params, batch_stats, opt_state):
        (_, _, _), losses = jax.lax.scan(
            one_step, (params, batch_stats, opt_state), None, length=reps
        )
        return losses.sum()

    float(run_n(params, batch_stats, opt_state))  # compile
    t0 = time.perf_counter()
    float(run_n(params, batch_stats, opt_state))
    return (time.perf_counter() - t0) / reps


def main():
    import jax

    out = {"device": str(jax.devices()[0])}
    out["config1_logistic_train60ep_s"] = round(config1_logistic(), 3)
    total, per_fit = config1_logistic_seed_parallel()
    out["config1_10seed_vmapped_total_s"] = round(total, 3)
    out["config1_10seed_vmapped_per_fit_s"] = round(per_fit, 4)
    anova_s, mlp_s = config2_anova_and_mlp()
    out["config2_anova_selection_s"] = round(anova_s, 5)
    out["config2_mlp_train60ep_s"] = round(mlp_s, 3)
    out["config4_synthesis_step_s"] = round(config4_synthesis_step(), 5)
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
