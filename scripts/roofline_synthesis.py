"""Prove or break the SynthesisModelCNN roofline claim (VERDICT r4 #3).

PROFILE.md argues the model's MFU at batch 32 is pinned by a ~5 ms
optimizer/weight-streaming HBM floor (101.8 M params) plus the 72 M-param
mel head's memory-bound matmul, both of which amortise with batch size.
This script supplies the missing datapoints:

1. **Batch sweep** (32/64/128 x f32/bf16/bf16+bf16-moments): per-step
   seconds, XLA cost-model FLOPs, and MFU. The claim predicts MFU rises
   with batch; if it stays flat, the floor explanation is wrong.
2. **Optimizer-only floor**: the NAdam update alone (fixed grads, no
   model) on the full 101.8 M-param tree — a direct measurement of the
   HBM floor the ablation inferred.
3. **Fused-update experiment**: a hand-fused single-tree-pass NAdam
   (same read-g/mu/nu/p + write-mu/nu/p memory pattern, one kernel)
   vs the optax chain. Equal times mean XLA already fuses the chain's
   passes (the floor is irreducible traffic); a gap bounds the chain's
   extra HBM passes.

Run on the real chip (the tunneled backend needs the honest timing
recipe; bench.py's helpers provide it):

    python scripts/roofline_synthesis.py [--batches 32,64,128]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402  (repo-root import: honest timing helpers)


def measure_step(batch, dtype_name, moment_dtype=None, **shape_kwargs):
    """(seconds/step, flops/step) of the full SynthesisModelCNN train
    step at the given batch/dtype — delegates to
    :func:`bench.synthesis_step_time` so the sweep measures EXACTLY the
    published bench step."""
    import jax.numpy as jnp

    return bench.synthesis_step_time(
        batch=batch, dtype=jnp.dtype(dtype_name), moment_dtype=moment_dtype,
        **shape_kwargs,
    )


def _synthesis_param_tree(channels=40, n_timepoints=200, n_dynamics=100,
                          n_mel=128 * 20):
    import jax
    import jax.numpy as jnp

    from decode_tonal_langauge_tpu.models.synthesis import SynthesisModelCNN

    rng = np.random.default_rng(0)
    ecog = jnp.asarray(
        rng.standard_normal((2, channels, n_timepoints)).astype(np.float32)
    )
    labels = jnp.asarray(
        rng.standard_normal((2, 2, n_dynamics)).astype(np.float32)
    )
    model = SynthesisModelCNN(
        output_dim=n_mel, n_channels=channels, n_timepoints=n_timepoints
    )
    return model.init(
        {"params": jax.random.key(0)}, ecog, labels, train=False
    )["params"]


def measure_optimizer_only(n_runs=50):
    """Direct measurement of the NAdam HBM floor on the 101.8 M-param
    tree: optax chain vs a hand-fused single-pass NAdam with the same
    memory pattern (read g/mu/nu/p, write mu/nu/p)."""
    import jax
    import jax.numpy as jnp
    import optax

    from decode_tonal_langauge_tpu.training.optim import (
        nadam_with_decay_groups,
    )

    params = _synthesis_param_tree()
    n_params = sum(int(np.size(p)) for p in jax.tree_util.tree_leaves(params))
    grads = jax.tree_util.tree_map(lambda p: jnp.full_like(p, 1e-4), params)
    optimizer = nadam_with_decay_groups(5e-4)
    opt_state = optimizer.init(params)

    def optax_step(carry, _):
        params, opt_state = carry
        # perturb grads from params so the scan body can't be hoisted
        g = jax.tree_util.tree_map(lambda gr, p: gr + 1e-12 * p, grads, params)
        updates, opt_state = optimizer.update(g, opt_state, params)
        return (optax.apply_updates(params, updates), opt_state), None

    @jax.jit
    def run_optax(params, opt_state):
        (params, _), _ = jax.lax.scan(
            optax_step, (params, opt_state), None, length=n_runs
        )
        return jax.tree_util.tree_reduce(
            lambda a, x: a + x.sum().astype(jnp.float32), params,
            jnp.float32(0.0),
        )

    b1, b2, eps, lr = 0.9, 0.999, 1e-8, 5e-4

    def fused_step(carry, _):
        params, mu, nu, count = carry
        count = count + 1
        bc1 = 1.0 - b1 ** count.astype(jnp.float32)
        bc2 = 1.0 - b2 ** count.astype(jnp.float32)

        def upd(p, m, v, gr):
            m2 = b1 * m + (1 - b1) * gr
            v2 = b2 * v + (1 - b2) * gr * gr
            # nesterov momentum, as optax.nadam
            mhat = (b1 * m2 + (1 - b1) * gr) / bc1
            nhat = v2 / bc2
            return p - lr * mhat / (jnp.sqrt(nhat) + eps), m2, v2

        g = jax.tree_util.tree_map(lambda gr, p: gr + 1e-12 * p, grads, params)
        out = jax.tree_util.tree_map(
            lambda p, m, v, gr: upd(p, m, v, gr), params, mu, nu, g,
            is_leaf=lambda x: isinstance(x, jax.Array),
        )
        new_p = jax.tree_util.tree_map(lambda t: t[0], out,
                                       is_leaf=lambda x: isinstance(x, tuple))
        new_mu = jax.tree_util.tree_map(lambda t: t[1], out,
                                        is_leaf=lambda x: isinstance(x, tuple))
        new_nu = jax.tree_util.tree_map(lambda t: t[2], out,
                                        is_leaf=lambda x: isinstance(x, tuple))
        return (new_p, new_mu, new_nu, count), None

    @jax.jit
    def run_fused(params, mu, nu):
        (params, _, _, _), _ = jax.lax.scan(
            fused_step, (params, mu, nu, jnp.int32(0)), None, length=n_runs
        )
        return jax.tree_util.tree_reduce(
            lambda a, x: a + x.sum().astype(jnp.float32), params,
            jnp.float32(0.0),
        )

    zeros = jax.tree_util.tree_map(jnp.zeros_like, params)

    optax_s = bench._time_scanned_steps(run_optax, (params, opt_state), n_runs)
    fused_s = bench._time_scanned_steps(run_fused, (params, zeros, zeros),
                                        n_runs)

    # traffic model: read p/mu/nu/g + write p/mu/nu = 7 x 4 bytes/param
    bytes_per_step = 7 * 4 * n_params
    return {
        "n_params": n_params,
        "optax_ms": optax_s * 1e3,
        "fused_ms": fused_s * 1e3,
        "traffic_gb": bytes_per_step / 1e9,
        "optax_gbps": bytes_per_step / optax_s / 1e9,
        "fused_gbps": bytes_per_step / fused_s / 1e9,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", default="32,64,128")
    ap.add_argument("--skip-optimizer", action="store_true")
    args = ap.parse_args()

    bench._require_backend()

    out = {"sweep": [], "optimizer": None}
    for batch in [int(b) for b in args.batches.split(",")]:
        for dtype_name, mom in (
            ("float32", None),
            ("bfloat16", None),
            ("bfloat16", "bfloat16"),
        ):
            s, f = measure_step(batch, dtype_name, moment_dtype=mom)
            row = {
                "batch": batch,
                "dtype": dtype_name + ("+bf16mom" if mom else ""),
                "ms_per_step": round(s * 1e3, 2),
                "flops": f,
                "mfu": round(bench._mfu(f, s), 4),
            }
            out["sweep"].append(row)
            print(json.dumps(row), flush=True)

    if not args.skip_optimizer:
        out["optimizer"] = measure_optimizer_only()
        print(json.dumps({"optimizer_only": out["optimizer"]}), flush=True)

    print(json.dumps(out, default=float))


if __name__ == "__main__":
    main()
