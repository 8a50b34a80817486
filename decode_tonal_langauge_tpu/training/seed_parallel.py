"""Seed-parallel training: all repeat seeds fitted as ONE vmapped jit.

The reference repeats every experiment ``repeat`` times in a Python loop
(``/root/reference/training/classifier_pipeline.py:88`` and ``:242``),
dispatching each tiny fit alone — for small models the per-dispatch
latency dominates wall time.  TPU-first redesign (SURVEY §2.7's
seed/repeat axis): stack the per-seed initial params, optimizer states,
RNG keys and split data on a leading *seed* axis and run the whole
multi-seed experiment as ``jit(vmap(fit))`` — one compile, one dispatch,
and the MXU sees batched matmuls ``repeat``× larger.

Exactness: every per-seed computation inside :meth:`ClassifierTrainer
._fit_scan` is independent of the other seeds, and ``jax.random`` is
deterministic per key, so the vmapped histories equal the sequential
ones (``tests/test_seed_parallel.py`` asserts this per seed).  The
optax decay mask (``optim.decay_mask``) sees *unbatched* shapes inside
vmap, so the ndim>=2 decay-group rule is unchanged.

Multi-device: with a mesh, the stacked seed axis is padded to a
multiple of ``data`` (duplicating the last seed; padded results are
dropped) and sharded over it — seeds are embarrassingly parallel, so
GSPMD partitions the fit with zero collectives (the ideal use of the
mesh for these small models).
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from functools import lru_cache
from typing import Any, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..parallel.mesh import fetch_global as _fetch
from .trainer import ClassifierTrainer, _stack_batches


@lru_cache(maxsize=32)
def _batched_fit_and_eval(proto: ClassifierTrainer, max_epochs: int,
                          patience: int, has_bn: bool):
    """jit(vmap(...)) callables for a trainer config, built ONCE.

    Rebuilding the jit wrapper per fit_eval call would discard the
    compile cache and recompile the whole multi-seed fit every time
    (measured: 10-seed logistic went 0.41 s/fit instead of ~0.03).
    ``proto`` hashes by its numeric config (ClassifierTrainer._static_key),
    so equal-config trainers share these; max_epochs/patience/_has_bn are
    keyed explicitly because the static key omits them."""
    const_key = jax.random.key(0)

    def init_and_fit(pkey, x, y, w, vxb, vyb, vwb):
        variables = proto.model.init(
            {"params": pkey, "dropout": const_key}, x[:1], train=False
        )
        params = variables["params"]
        batch_stats = variables.get("batch_stats", {})
        opt_state = proto.optimizer.init(params)
        return proto._fit_scan(
            max_epochs, patience,
            params, batch_stats, opt_state, pkey,
            x, y, w, vxb, vyb, vwb,
        )

    fit = jax.jit(jax.vmap(init_and_fit))
    evaluate = jax.jit(
        jax.vmap(lambda p, bs, a, b, c: proto._eval_epoch(p, bs, a, b, c))
    )
    return fit, evaluate


@dataclass
class SeedFitResult:
    """Per-seed outcome of a seed-parallel fit (mirrors what the
    sequential path extracts from one ``ClassifierTrainer``)."""

    seed: int
    history: List[Dict[str, float]]
    best_epoch: int
    stopped_early: bool
    test_true: np.ndarray
    test_preds: np.ndarray
    n_params: int
    params: Any = field(repr=False, default=None)
    batch_stats: Any = field(repr=False, default=None)
    # (mu, sd) of the per-seed train-split standardisation, when
    # params.standardize is on — checkpointed so inference can reproduce
    # the feature scaling the classifier was trained under.
    scaler: Any = field(repr=False, default=None)


class SeedParallelTrainer:
    """Fits ``len(seeds)`` independent classifiers in one vmapped jit.

    Reuses :class:`ClassifierTrainer`'s jitted building blocks (the
    prototype trainer is built with ``mesh=None`` — the *seed* axis is
    the parallel axis here, placed over the mesh externally).
    """

    def __init__(
        self,
        model,
        n_classes: int,
        seeds: Sequence[int],
        learning_rate: float = 5e-4,
        weight_decay: float = 0.0,
        batch_size: int = 64,
        max_epochs: int = 10,
        patience: int = 5,
        mesh: Optional[jax.sharding.Mesh] = None,
        verbose: bool = False,
        scan_unroll: int = 1,
        moment_dtype: Optional[str] = None,
        seed_chunk: Optional[int] = None,
    ):
        self.seeds = [int(s) for s in seeds]
        self.mesh = mesh
        self.verbose = verbose
        # seed_chunk bounds the vmapped width: a 48-seed CNN-RNN fit
        # stacks ~48x (params + grads + 2 moments + conv activations)
        # and can exceed one chip's HBM; chunks of `seed_chunk` seeds
        # run sequentially, each still one vmapped jit (identical
        # per-seed results — seeds are independent).
        self.seed_chunk = int(seed_chunk) if seed_chunk else None
        self._ctor_kwargs = dict(
            n_classes=n_classes,
            learning_rate=learning_rate,
            weight_decay=weight_decay,
            batch_size=batch_size,
            max_epochs=max_epochs,
            patience=patience,
            mesh=mesh,
            verbose=verbose,
            scan_unroll=scan_unroll,
            moment_dtype=moment_dtype,
        )
        self._proto = ClassifierTrainer(
            model,
            n_classes=n_classes,
            learning_rate=learning_rate,
            weight_decay=weight_decay,
            batch_size=batch_size,
            max_epochs=max_epochs,
            patience=patience,
            seed=self.seeds[0],
            mesh=None,
            scan_unroll=scan_unroll,
            moment_dtype=moment_dtype,
        )

    # ------------------------------------------------------------------
    def _seed_mesh(self, n_seeds: int):
        """The mesh, when its ``data`` axis can shard the seed axis."""
        if self.mesh is None:
            return None
        dp = int(self.mesh.shape.get("data", 1))
        if dp <= 1:
            return None
        if n_seeds % dp != 0:
            # The caller pads the seed axis to a dp multiple before
            # placement (_pad_seed_axis); hitting this means an
            # unpadded tree slipped through — run unsharded but say so.
            print(
                f"seed-parallel: {n_seeds} seeds not divisible by "
                f"data={dp}; running unsharded on one device"
            )
            return None
        return self.mesh

    def _place(self, tree):
        """Shard every leaf's leading (seed) axis over ``data`` if possible."""
        mesh = self._seed_mesh(
            np.shape(jax.tree_util.tree_leaves(tree)[0])[0]
        )
        if mesh is None:
            return tree
        from jax.sharding import NamedSharding, PartitionSpec as P

        from ..parallel.mesh import global_device_put

        def put(leaf):
            spec = P("data", *([None] * (np.ndim(leaf) - 1)))
            return global_device_put(leaf, NamedSharding(mesh, spec))

        return jax.tree_util.tree_map(put, tree)

    # ------------------------------------------------------------------
    def fit_eval(
        self,
        train_x: np.ndarray,  # (S, Ntr, ...)
        train_y: np.ndarray,  # (S, Ntr)
        val_x: np.ndarray,
        val_y: np.ndarray,
        test_x: np.ndarray,
        test_y: np.ndarray,
    ) -> List[SeedFitResult]:
        """Fit all seeds at once; returns per-seed results in seed order.

        All arrays carry a leading seed axis (per-seed split gathers —
        same sizes across seeds because ``split_indices`` sizes depend
        only on ``n`` and the ratios).
        """
        proto = self._proto
        S = len(self.seeds)
        assert train_x.shape[0] == S, (train_x.shape, S)

        if self.seed_chunk and S > self.seed_chunk:
            # Memory-bounded path: sequential chunks, each one vmapped
            # jit. Per-seed results are bitwise those of the unchunked
            # fit (tests/test_seed_parallel.py asserts equality).
            out: List[SeedFitResult] = []
            c = self.seed_chunk
            arrays = (train_x, train_y, val_x, val_y, test_x, test_y)
            for i in range(0, S, c):
                sub = SeedParallelTrainer(
                    proto.model, seeds=self.seeds[i : i + c],
                    **self._ctor_kwargs,
                )
                out.extend(sub.fit_eval(*(a[i : i + c] for a in arrays)))
            return out

        B = proto.batch_size

        # Pad the seed axis to a multiple of the mesh's data axis
        # (duplicating the last seed) so the vmapped fit always shards;
        # padded seeds' results are sliced off below.
        dp = (
            int(self.mesh.shape.get("data", 1))
            if self.mesh is not None
            else 1
        )
        S_pad = -(-S // dp) * dp
        seeds_padded = self.seeds + [self.seeds[-1]] * (S_pad - S)

        def pad_seed_axis(arr):
            if S_pad == S:
                return arr
            return np.concatenate(
                [arr, np.repeat(arr[-1:], S_pad - S, axis=0)], axis=0
            )

        train_x, train_y, val_x, val_y, test_x, test_y = (
            pad_seed_axis(a)
            for a in (train_x, train_y, val_x, val_y, test_x, test_y)
        )

        def host_stack(xs, ys):
            """Per-seed _stack_batches, stacked on the seed axis."""
            xb, yb, wb = zip(
                *(_stack_batches(xs[i], ys[i], B) for i in range(S_pad))
            )
            return np.stack(xb), np.stack(yb), np.stack(wb)

        vxb, vyb, vwb = host_stack(val_x, val_y)
        txb, tyb, twb = host_stack(train_x, train_y)
        # Flatten train batches back to one (S, N_pad, ...) block; the
        # per-epoch shuffle happens on device inside the fit scan.
        x = txb.reshape((S_pad, -1) + txb.shape[3:])
        y = tyb.reshape((S_pad, -1))
        w = twb.reshape((S_pad, -1))

        seed_keys = jax.vmap(jax.random.key)(
            jnp.asarray(seeds_padded, dtype=jnp.uint32)
        )

        # _has_bn feeds the trainer's static jit key; resolve it once
        # before tracing (abstract init, no FLOPs).
        shapes = jax.eval_shape(
            lambda k: proto.model.init(
                {"params": k, "dropout": jax.random.key(0)},
                jnp.asarray(x[0, :1]), train=False,
            ),
            jax.random.key(0),
        )
        proto._has_bn = "batch_stats" in shapes

        fit, evaluate = _batched_fit_and_eval(
            proto, proto.max_epochs, proto.patience, proto._has_bn
        )

        # NOTE: the per-seed RNG both seeds the param init and is carried
        # into the fit scan — exactly ClassifierTrainer.init + fit, which
        # use jax.random.key(seed) for both.
        fitted = fit(seed_keys, *self._place((x, y, w, vxb, vyb, vwb)))
        params, batch_stats, opt_state, rng, es, history = fitted
        _, best_epoch, _, stopped = es

        # Test predictions for every seed in one vmapped eval.
        exb, eyb, ewb = host_stack(
            test_x, np.zeros(test_y.shape, dtype=np.int32)
        )
        _, _, preds = evaluate(
            params, batch_stats, *self._place((exb, eyb, ewb))
        )
        preds = _fetch(preds).reshape(S_pad, -1)[:S, : test_x.shape[1]]

        tr_loss, tr_acc, w_norm, val_loss, val_acc, executed = (
            _fetch(m) for m in history
        )
        best_epoch = _fetch(best_epoch)
        stopped = _fetch(stopped)
        # Per-seed param slices below are host reads too on a
        # cross-host mesh: fetch the trees once.
        params = jax.tree_util.tree_map(_fetch, params)
        batch_stats = jax.tree_util.tree_map(_fetch, batch_stats)

        n_params = int(
            sum(np.size(leaf) for leaf in jax.tree_util.tree_leaves(params))
        ) // max(S_pad, 1)

        results: List[SeedFitResult] = []
        for i, seed in enumerate(self.seeds):
            rows: List[Dict[str, float]] = []
            for epoch in range(proto.max_epochs):
                if not executed[i, epoch]:
                    break
                rows.append(
                    {
                        "epoch": epoch,
                        "train/loss": float(tr_loss[i, epoch]),
                        "train/accuracy": float(tr_acc[i, epoch]),
                        "train/weight_norm": float(w_norm[i, epoch]),
                        "val/loss": float(val_loss[i, epoch]),
                        "val/accuracy": float(val_acc[i, epoch]),
                    }
                )
            take = lambda tree, i=i: jax.tree_util.tree_map(
                lambda leaf: leaf[i], tree
            )
            results.append(
                SeedFitResult(
                    seed=seed,
                    history=rows,
                    best_epoch=int(best_epoch[i]),
                    stopped_early=bool(stopped[i]),
                    test_true=test_y[i],
                    test_preds=preds[i],
                    n_params=n_params,
                    params=take(params),
                    batch_stats=take(batch_stats),
                )
            )
        return results

    # ------------------------------------------------------------------
    def write_logs(self, result: SeedFitResult, log_dir: Optional[str]) -> None:
        """Per-seed metrics.csv + confusion CSV, matching the sequential
        trainer's side outputs."""
        if not log_dir:
            return
        proto = self._proto
        proto.log_dir = log_dir
        proto._write_history(result.history)
        import pandas as pd
        from sklearn import metrics as skm

        cm = skm.confusion_matrix(
            result.test_true,
            result.test_preds,
            labels=np.arange(proto.n_classes),
        )
        pd.DataFrame(cm).to_csv(
            os.path.join(log_dir, "confusion_matrix_test.csv"),
            index=False,
            header=False,
        )
