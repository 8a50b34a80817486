"""Jitted classifier trainer with early stopping and scalar logging.

Replaces the reference's PyTorch-Lightning wrapper
(``/root/reference/models/classifier_trainer.py``): cross-entropy loss,
NAdam with decay groups, train/val loss + macro-accuracy + weight-norm
logging, early stopping on validation loss, test-time confusion matrix,
argmax prediction.

TPU-native structure: the whole (small) dataset lives on device; an epoch
is ONE jitted call that ``lax.scan``s over fixed-shape batches (the last
batch is padded and masked), so there is no per-batch dispatch overhead.
With a ``mesh``, the per-batch sample axis of the scanned stacks is
sharded over the mesh's ``data`` axis and params are replicated; GSPMD
partitions the forward/backward and inserts the gradient ``psum``
(parity with the single-device run is tested in ``tests/test_parallel.py``).
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from functools import partial
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..data.splits import split_indices
from .optim import nadam_with_decay_groups


def _stack_batches(x: np.ndarray, y: np.ndarray, batch_size: int):
    """Pad to a multiple of batch_size and reshape to (n_batches, B, ...).

    Returns (xb, yb, wb) where ``wb`` masks out padding samples.
    """
    n = x.shape[0]
    n_batches = max(1, -(-n // batch_size))
    pad = n_batches * batch_size - n
    w = np.ones(n, dtype=np.float32)
    if pad:
        x = np.concatenate([x, np.repeat(x[:1], pad, axis=0)], axis=0)
        y = np.concatenate([y, np.repeat(y[:1], pad, axis=0)], axis=0)
        w = np.concatenate([w, np.zeros(pad, dtype=np.float32)])
    xb = x.reshape((n_batches, batch_size) + x.shape[1:])
    yb = y.reshape((n_batches, batch_size))
    wb = w.reshape((n_batches, batch_size))
    return xb, yb, wb


def _macro_accuracy(preds, y, w, n_classes: int):
    """Macro-averaged per-class accuracy (torchmetrics parity)."""
    onehot = jax.nn.one_hot(y, n_classes) * w[:, None]
    correct = jax.nn.one_hot(y, n_classes) * (preds == y)[:, None] * w[:, None]
    support = onehot.sum(axis=0)
    per_class = jnp.where(support > 0, correct.sum(axis=0) / jnp.maximum(support, 1), 0.0)
    n_present = jnp.maximum((support > 0).sum(), 1)
    return per_class.sum() / n_present


@dataclass
class FitResult:
    history: List[Dict[str, float]]
    best_epoch: int
    stopped_early: bool


class ClassifierTrainer:
    """Trains a Flax classifier on an on-device dataset."""

    def __init__(
        self,
        model,
        n_classes: int,
        learning_rate: float = 5e-4,
        weight_decay: float = 0.0,
        batch_size: int = 64,
        max_epochs: int = 10,
        patience: int = 5,
        seed: int = 0,
        log_dir: Optional[str] = None,
        mesh: Optional[jax.sharding.Mesh] = None,
        verbose: bool = False,
    ):
        self.model = model
        self.n_classes = n_classes
        self.max_epochs = max_epochs
        self.patience = patience
        self.seed = seed
        self.log_dir = log_dir
        self.mesh = mesh
        self.verbose = verbose
        self.optimizer = nadam_with_decay_groups(learning_rate, weight_decay)

        self._dp = 1
        self._batch_sharding = None
        self._replicated = None
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            self._dp = int(mesh.shape["data"])
            # Scanned stacks are (n_batches, B, ...): shard the per-batch
            # sample axis (axis 1) over `data`.
            self._batch_sharding = lambda ndim: NamedSharding(
                mesh, P(None, "data", *([None] * (ndim - 2)))
            )
            self._replicated = NamedSharding(mesh, P())
        # Each scanned batch must split evenly over the data axis.
        self.batch_size = -(-batch_size // self._dp) * self._dp

        self.params = None
        self.batch_stats: Dict[str, Any] = {}
        self.opt_state = None
        self._has_bn = False

    # ------------------------------------------------------------------
    def init(self, sample_x: np.ndarray) -> None:
        rngs = {"params": jax.random.key(self.seed), "dropout": jax.random.key(0)}
        variables = self.model.init(rngs, jnp.asarray(sample_x[:1]), train=False)
        self.params = variables["params"]
        self.batch_stats = variables.get("batch_stats", {})
        self._has_bn = "batch_stats" in variables
        self.opt_state = self.optimizer.init(self.params)
        if self.mesh is not None:
            put = lambda t: jax.tree_util.tree_map(
                lambda leaf: jax.device_put(leaf, self._replicated), t
            )
            self.params = put(self.params)
            self.batch_stats = put(self.batch_stats)
            self.opt_state = put(self.opt_state)

    def _place_stacks(self, xb, yb, wb):
        """Move batch stacks to device, sharded over `data` if meshed."""
        if self.mesh is None:
            return xb, yb, wb
        return (
            jax.device_put(xb, self._batch_sharding(xb.ndim)),
            jax.device_put(yb, self._batch_sharding(yb.ndim)),
            jax.device_put(wb, self._batch_sharding(wb.ndim)),
        )

    def n_params(self) -> int:
        return int(
            sum(np.size(leaf) for leaf in jax.tree_util.tree_leaves(self.params))
        )

    # ------------------------------------------------------------------
    def _apply(self, params, batch_stats, x, train: bool, rng=None):
        variables = {"params": params}
        if self._has_bn:
            variables["batch_stats"] = batch_stats
        kwargs = dict(train=train)
        if train:
            out, updates = self.model.apply(
                variables,
                x,
                **kwargs,
                rngs={"dropout": rng},
                mutable=["batch_stats"] if self._has_bn else [],
            )
            new_bs = updates.get("batch_stats", batch_stats) if self._has_bn else batch_stats
            return out, new_bs
        return self.model.apply(variables, x, **kwargs), batch_stats

    @partial(jax.jit, static_argnums=(0,))
    def _train_epoch(self, params, batch_stats, opt_state, rng, xb, yb, wb):
        def step(carry, batch):
            params, batch_stats, opt_state, rng = carry
            x, y, w = batch
            rng, dropout_rng = jax.random.split(rng)

            def loss_fn(p, bs):
                out, new_bs = self._apply(p, bs, x, train=True, rng=dropout_rng)
                ce = optax.softmax_cross_entropy_with_integer_labels(out, y)
                loss = (ce * w).sum() / jnp.maximum(w.sum(), 1.0)
                preds = out.argmax(axis=-1)
                acc = _macro_accuracy(preds, y, w, self.n_classes)
                return loss, (new_bs, acc)

            (loss, (new_bs, acc)), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(params, batch_stats)
            updates, opt_state = self.optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, new_bs, opt_state, rng), (loss, acc)

        (params, batch_stats, opt_state, rng), (losses, accs) = jax.lax.scan(
            step, (params, batch_stats, opt_state, rng), (xb, yb, wb)
        )
        weight_norm = optax.global_norm(params)
        return params, batch_stats, opt_state, rng, losses.mean(), accs.mean(), weight_norm

    @partial(jax.jit, static_argnums=(0,))
    def _eval_epoch(self, params, batch_stats, xb, yb, wb):
        def step(_, batch):
            x, y, w = batch
            out, _ = self._apply(params, batch_stats, x, train=False)
            ce = optax.softmax_cross_entropy_with_integer_labels(out, y)
            loss = (ce * w).sum() / jnp.maximum(w.sum(), 1.0)
            preds = out.argmax(axis=-1)
            acc = _macro_accuracy(preds, y, w, self.n_classes)
            return None, (loss, acc, preds)

        _, (losses, accs, preds) = jax.lax.scan(step, None, (xb, yb, wb))
        return losses.mean(), accs.mean(), preds

    # ------------------------------------------------------------------
    def fit(
        self,
        train_x: np.ndarray,
        train_y: np.ndarray,
        val_x: np.ndarray,
        val_y: np.ndarray,
    ) -> FitResult:
        if self.params is None:
            self.init(train_x)

        rng = jax.random.key(self.seed)
        data_rng = np.random.default_rng(self.seed)
        vxb, vyb, vwb = self._place_stacks(
            *_stack_batches(val_x, val_y, self.batch_size)
        )

        history: List[Dict[str, float]] = []
        best_val = np.inf
        best_epoch = -1
        best_state = None
        bad_epochs = 0
        stopped_early = False

        for epoch in range(self.max_epochs):
            order = data_rng.permutation(train_x.shape[0])
            xb, yb, wb = self._place_stacks(
                *_stack_batches(train_x[order], train_y[order], self.batch_size)
            )
            (
                self.params,
                self.batch_stats,
                self.opt_state,
                rng,
                tr_loss,
                tr_acc,
                w_norm,
            ) = self._train_epoch(
                self.params, self.batch_stats, self.opt_state, rng, xb, yb, wb
            )
            val_loss, val_acc, _ = self._eval_epoch(
                self.params, self.batch_stats, vxb, vyb, vwb
            )

            row = {
                "epoch": epoch,
                "train/loss": float(tr_loss),
                "train/accuracy": float(tr_acc),
                "train/weight_norm": float(w_norm),
                "val/loss": float(val_loss),
                "val/accuracy": float(val_acc),
            }
            history.append(row)
            if self.verbose:
                print(
                    f"epoch {epoch}: train/loss={row['train/loss']:.4f} "
                    f"val/loss={row['val/loss']:.4f} val/acc={row['val/accuracy']:.4f}"
                )

            if row["val/loss"] < best_val:
                best_val = row["val/loss"]
                best_epoch = epoch
                best_state = (self.params, self.batch_stats)
                bad_epochs = 0
            else:
                bad_epochs += 1
                if bad_epochs > self.patience:
                    stopped_early = True
                    break

        # Keep the final weights (reference keeps last epoch, not best);
        # best_state retained for inspection.
        self._best_state = best_state

        if self.log_dir:
            self._write_history(history)

        return FitResult(history, best_epoch, stopped_early)

    # ------------------------------------------------------------------
    def predict(self, x: np.ndarray) -> np.ndarray:
        """Argmax class predictions."""
        xb, yb, wb = self._place_stacks(
            *_stack_batches(x, np.zeros(x.shape[0], dtype=np.int32), self.batch_size)
        )
        _, _, preds = self._eval_epoch(self.params, self.batch_stats, xb, yb, wb)
        return np.asarray(preds).reshape(-1)[: x.shape[0]]

    def test(
        self, x: np.ndarray, y: np.ndarray, log_confusion: bool = True
    ) -> Dict[str, Any]:
        """Test metrics: macro accuracy/F1 + confusion matrix (like the
        reference's Lightning test loop)."""
        preds = self.predict(x)
        from sklearn import metrics as skm

        out = {
            "accuracy_macro": float(
                skm.balanced_accuracy_score(y, preds)
            ),
            "f1_macro": float(skm.f1_score(y, preds, average="macro")),
            "confusion_matrix": skm.confusion_matrix(
                y, preds, labels=np.arange(self.n_classes)
            ),
        }
        if self.log_dir and log_confusion:
            import pandas as pd

            os.makedirs(self.log_dir, exist_ok=True)
            pd.DataFrame(out["confusion_matrix"]).to_csv(
                os.path.join(self.log_dir, "confusion_matrix_test.csv"),
                index=False,
                header=False,
            )
        return out

    # ------------------------------------------------------------------
    def _write_history(self, history: List[Dict[str, float]]) -> None:
        import pandas as pd

        os.makedirs(self.log_dir, exist_ok=True)
        pd.DataFrame(history).to_csv(
            os.path.join(self.log_dir, "metrics.csv"), index=False
        )
        try:
            from tensorboardX import SummaryWriter

            writer = SummaryWriter(self.log_dir)
            for row in history:
                for key, value in row.items():
                    if key != "epoch":
                        writer.add_scalar(key, value, row["epoch"])
            writer.close()
        except Exception:  # pragma: no cover - TB logging is best-effort
            pass


def train_val_test_split(
    n: int, train_ratio: float, val_ratio: float, test_ratio: float, seed: int
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """70/10/20-style split with the reference's size rules."""
    return tuple(split_indices(n, [train_ratio, val_ratio, test_ratio], seed))
