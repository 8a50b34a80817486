"""Jitted classifier trainer with early stopping and scalar logging.

Replaces the reference's PyTorch-Lightning wrapper
(``/root/reference/models/classifier_trainer.py``): cross-entropy loss,
NAdam with decay groups, train/val loss + macro-accuracy + weight-norm
logging, early stopping on validation loss, test-time confusion matrix,
argmax prediction.

TPU-native structure: the whole (small) dataset lives on device and the
ENTIRE fit — per-epoch on-device shuffling, batch scan, validation pass,
early-stopping bookkeeping — is ONE jitted call (``lax.scan`` over epochs
around ``lax.scan`` over fixed-shape padded/masked batches). A per-epoch
Python loop would pay one host round trip per epoch, which dominates end
to end for small models (dispatch latency is ~tens of ms on tunneled
chips, ~ms even locally); here the host reads back only the stacked
history once. Early stopping inside the scan freezes the carried state
after patience runs out (same result as breaking, paid as cheap no-op
iterations).

With a ``mesh``, the per-batch sample axis is sharded over the mesh's
``data`` axis and params are replicated; GSPMD partitions the
forward/backward and inserts the gradient ``psum`` (parity with the
single-device run is tested in ``tests/test_parallel.py``).
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
        scan_unroll: int = 1,
        moment_dtype: Optional[str] = None,
    ):
        # Unroll factor for the inner batch/eval scans: lets XLA fuse
        # across per-batch kernels of tiny models where loop overhead
        # dominates. Semantics-neutral (histories are identical; see
        # tests/test_training.py); tune per chip — through this repo's
        # tunneled backend the effect is below measurement noise.
        self.scan_unroll = max(1, int(scan_unroll))
        self.model = model
        self.n_classes = n_classes
        self.max_epochs = max_epochs
        self.patience = patience
        self.seed = seed
        self.log_dir = log_dir
        self.mesh = mesh
        self.verbose = verbose
        self._learning_rate = learning_rate
        self._weight_decay = weight_decay
        # `moment_dtype` (e.g. "bfloat16"): reduced-precision optimizer
        # moments at rest — halves the NAdam state's HBM traffic and
        # footprint for big models; see optim.with_moment_dtype.
        self._moment_dtype = moment_dtype
        self.optimizer = nadam_with_decay_groups(
            learning_rate, weight_decay, moment_dtype=moment_dtype
        )

        from ..parallel.mesh import DataParallelLayout

        self._layout = DataParallelLayout(mesh)
        # Each scanned batch must split evenly over the data axis.
        self.batch_size = self._layout.round_batch(batch_size)

        self.params = None
        self.batch_stats: Dict[str, Any] = {}
        self.opt_state = None
        self._has_bn = False

    # ------------------------------------------------------------------
    # The jitted methods take `self` as a static argument; hashing by the
    # numeric configuration (instead of object identity) lets every
    # trainer with the same model/optimizer/batching reuse the compiled
    # fit — the pipeline builds one trainer per (target, seed), and
    # per-instance hashing would recompile each time. Only fields the
    # traced code actually reads may go into this key; mutable training
    # state (params, opt_state, rng) is always passed as an argument.
    def _static_key(self):
        return (
            type(self), self.model, self.n_classes, self.batch_size,
            self._learning_rate, self._weight_decay, self.mesh, self._has_bn,
            self.scan_unroll, self._moment_dtype,
        )

    def __hash__(self):
        return hash(self._static_key())

    def __eq__(self, other):
        return (
            isinstance(other, ClassifierTrainer)
            and self._static_key() == other._static_key()
        )

    # ------------------------------------------------------------------
    def init(self, sample_x: np.ndarray) -> None:
        rngs = {"params": jax.random.key(self.seed), "dropout": jax.random.key(0)}
        variables = self.model.init(rngs, jnp.asarray(sample_x[:1]), train=False)
        self.params = variables["params"]
        self.batch_stats = variables.get("batch_stats", {})
        self._has_bn = "batch_stats" in variables
        self.opt_state = self.optimizer.init(self.params)
        self.params = self._layout.replicate_tree(self.params)
        self.batch_stats = self._layout.replicate_tree(self.batch_stats)
        self.opt_state = self._layout.replicate_tree(self.opt_state)

    def _place_stacks(self, xb, yb, wb):
        """Move batch stacks to device, sharded over `data` if meshed."""
        return self._layout.place_stacks(xb, yb, wb)

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

    def _batch_step(self, carry, batch):
        """One optimizer step on a masked batch (scanned)."""
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

        (loss, (new_bs, acc)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, batch_stats
        )
        updates, opt_state = self.optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return (params, new_bs, opt_state, rng), (loss, acc)

    def _constrain_stack(self, arr):
        """Pin the per-batch sample axis of a scanned stack to `data`."""
        return self._layout.constrain_stack(arr)

    # Donation: the incoming params/opt-state/rng buffers are dead after
    # the fit (fit() reassigns them from the outputs), so XLA reuses
    # their HBM for the results instead of allocating a second copy of
    # the training state (alias correctness tested in
    # tests/test_runtime.py::TestDonation).
    @partial(jax.jit, static_argnums=(0, 1, 2), donate_argnums=(3, 4, 5, 6))
    def _fit_scan(
        self, n_epochs, patience,
        params, batch_stats, opt_state, rng,
        x, y, w, vxb, vyb, vwb,
        es=None, epoch0=0,
    ):
        """The whole training run as one compiled computation.

        Scans epochs; each epoch shuffles on device, scans batches, runs
        the validation pass, and updates early-stopping state. Epochs
        after the stop are frozen no-ops (metrics NaN), so the host can
        reconstruct exactly the per-epoch history the reference's loop
        would have produced.

        ``es`` (best_val, best_epoch, bad, stopped) and ``epoch0`` let a
        checkpointed fit continue exactly where a previous segment left
        off (full train-state resume); the defaults reproduce a fresh
        fit. Returns the final es tuple so callers can checkpoint it.
        """
        n = x.shape[0]
        n_batches = n // self.batch_size

        def eval_pass(params, batch_stats):
            def step(_, batch):
                bx, by, bw = batch
                out, _ = self._apply(params, batch_stats, bx, train=False)
                ce = optax.softmax_cross_entropy_with_integer_labels(out, by)
                loss = (ce * bw).sum() / jnp.maximum(bw.sum(), 1.0)
                acc = _macro_accuracy(out.argmax(axis=-1), by, bw, self.n_classes)
                return None, (loss, acc)

            _, (losses, accs) = jax.lax.scan(
                step, None, (vxb, vyb, vwb), unroll=self.scan_unroll
            )
            return losses.mean(), accs.mean()

        def do_epoch(operand):
            params, batch_stats, opt_state, rng = operand
            rng, perm_rng = jax.random.split(rng)
            perm = jax.random.permutation(perm_rng, n)
            xb = self._constrain_stack(
                x[perm].reshape((n_batches, self.batch_size) + x.shape[1:])
            )
            yb = self._constrain_stack(
                y[perm].reshape((n_batches, self.batch_size))
            )
            wb = self._constrain_stack(
                w[perm].reshape((n_batches, self.batch_size))
            )
            (params, batch_stats, opt_state, rng), (losses, accs) = jax.lax.scan(
                self._batch_step, (params, batch_stats, opt_state, rng),
                (xb, yb, wb), unroll=self.scan_unroll,
            )
            val_loss, val_acc = eval_pass(params, batch_stats)
            metrics = (
                losses.mean(), accs.mean(), optax.global_norm(params),
                val_loss, val_acc,
            )
            return (params, batch_stats, opt_state, rng), metrics

        def skip_epoch(operand):
            nan = jnp.float32(jnp.nan)
            return operand, (nan, nan, nan, nan, nan)

        def epoch_body(carry, epoch):
            state, best_val, best_epoch, bad, stopped = carry
            executed = ~stopped  # explicit flag: NaN metrics alone are
            # ambiguous (genuine divergence also produces NaN losses)
            state, metrics = jax.lax.cond(stopped, skip_epoch, do_epoch, state)
            val_loss = metrics[3]

            improved = jnp.logical_and(~stopped, val_loss < best_val)
            best_val = jnp.where(improved, val_loss, best_val)
            best_epoch = jnp.where(improved, epoch, best_epoch)
            bad = jnp.where(stopped, bad, jnp.where(improved, 0, bad + 1))
            stopped = jnp.logical_or(stopped, bad > patience)
            return (state, best_val, best_epoch, bad, stopped), metrics + (executed,)

        if es is None:
            es = (
                jnp.float32(jnp.inf), jnp.int32(-1), jnp.int32(0),
                jnp.bool_(False),
            )
        init = ((params, batch_stats, opt_state, rng),) + tuple(es)
        epochs = jnp.arange(n_epochs, dtype=jnp.int32) + jnp.int32(epoch0)
        (state, best_val, best_epoch, bad, stopped), history = jax.lax.scan(
            epoch_body, init, epochs
        )
        params, batch_stats, opt_state, rng = state
        es_out = (best_val, best_epoch, bad, stopped)
        return params, batch_stats, opt_state, rng, es_out, history

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
    # Full train-state checkpointing (SURVEY §5; supersedes the
    # reference's params-only ``torch.save(model.state_dict())``,
    # ``/root/reference/training/classifier_pipeline.py:161-168``): the
    # ENTIRE fit-scan carry — params, batch_stats, opt_state, the RNG
    # key, early-stopping bookkeeping, epoch counter, and metric history
    # — round-trips through Orbax, so a resumed fit continues the exact
    # trajectory of an uninterrupted one (tests/test_resume.py).
    def _save_train_state(self, path, rng, es, epochs_done, history) -> None:
        from ..runtime.checkpoint import save_train_state

        state = {
            "params": self.params,
            "opt_state": list(jax.tree_util.tree_leaves(self.opt_state)),
            "rng": jax.random.key_data(rng),
            "es": {
                "best_val": es[0], "best_epoch": es[1],
                "bad": es[2], "stopped": es[3],
            },
            "epochs_done": np.int32(epochs_done),
            "history": np.asarray(history, np.float32),
        }
        if self._has_bn:
            state["batch_stats"] = self.batch_stats
        save_train_state(path, state)

    def _restore_train_state(self, path):
        """Returns (rng, es, epochs_done, history) and rebinds the
        params/batch_stats/opt_state attributes, or None when no state
        exists at ``path``. Call after :meth:`init` (the optimizer-state
        tree structure is taken from the live ``opt_state``)."""
        from ..runtime.checkpoint import load_params, train_state_exists

        if not train_state_exists(path):
            return None
        restored = load_params(path)
        put = self._layout.replicate_tree
        self.params = put(restored["params"])
        if "batch_stats" in restored:
            self.batch_stats = put(restored["batch_stats"])
            self._has_bn = True
        self.opt_state = put(
            jax.tree_util.tree_unflatten(
                jax.tree_util.tree_structure(self.opt_state),
                restored["opt_state"],
            )
        )
        rng = jax.random.wrap_key_data(
            jnp.asarray(restored["rng"], dtype=jnp.uint32)
        )
        es = (
            jnp.float32(restored["es"]["best_val"]),
            jnp.int32(restored["es"]["best_epoch"]),
            jnp.int32(restored["es"]["bad"]),
            jnp.asarray(restored["es"]["stopped"], dtype=bool),
        )
        history = np.asarray(restored["history"], np.float32).reshape(-1, 6)
        return rng, es, int(restored["epochs_done"]), history

    def fit(
        self,
        train_x: np.ndarray,
        train_y: np.ndarray,
        val_x: np.ndarray,
        val_y: np.ndarray,
        checkpoint_dir: Optional[str] = None,
        resume: bool = False,
        checkpoint_every: Optional[int] = None,
    ) -> FitResult:
        """Fit with early stopping.

        ``checkpoint_dir``: save the full train state there (after every
        ``checkpoint_every`` epochs — default: once at the end). With
        ``resume=True`` an existing state at that path continues exactly
        where it left off (``max_epochs`` counts TOTAL epochs across the
        original fit and the resume). Segments of different lengths
        compile separately; keep ``checkpoint_every`` a divisor of the
        remaining epochs to reuse one compilation.
        """
        if self.params is None:
            self.init(train_x)

        rng = jax.random.key(self.seed)
        es = None
        epochs_done = 0
        history_arr = np.zeros((0, 6), dtype=np.float32)

        if checkpoint_dir and resume:
            restored = self._restore_train_state(checkpoint_dir)
            if restored is not None:
                rng, es, epochs_done, history_arr = restored

        vxb, vyb, vwb = self._place_stacks(
            *_stack_batches(val_x, val_y, self.batch_size)
        )

        # Flatten the train set to one padded (N_pad, ...) block; the
        # per-epoch shuffle happens on device inside the fit scan.
        xb, yb, wb = _stack_batches(train_x, train_y, self.batch_size)
        x = xb.reshape((-1,) + xb.shape[2:])
        y = yb.reshape(-1)
        w = wb.reshape(-1)
        x = self._layout.replicate_tree(x)
        y = self._layout.replicate_tree(y)
        w = self._layout.replicate_tree(w)

        seg_size = (
            int(checkpoint_every)
            if (checkpoint_dir and checkpoint_every)
            else self.max_epochs
        )
        while epochs_done < self.max_epochs:
            if es is not None and bool(np.asarray(es[3])):
                break  # early-stopped in a previous segment
            seg = min(seg_size, self.max_epochs - epochs_done)
            (
                self.params,
                self.batch_stats,
                self.opt_state,
                rng,
                es,
                metrics,
            ) = self._fit_scan(
                seg, self.patience,
                self.params, self.batch_stats, self.opt_state, rng,
                x, y, w, vxb, vyb, vwb,
                es, epochs_done,
            )
            chunk = np.stack([np.asarray(m) for m in metrics], axis=1)
            history_arr = np.concatenate([history_arr, chunk.astype(np.float32)])
            epochs_done += seg
            if checkpoint_dir:
                self._save_train_state(
                    checkpoint_dir, rng, es, epochs_done, history_arr
                )

        history: List[Dict[str, float]] = []
        for epoch in range(history_arr.shape[0]):
            tr_loss, tr_acc, w_norm, val_loss, val_acc, executed = (
                history_arr[epoch]
            )
            if not executed:
                break  # frozen post-stop epochs
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

        if self.log_dir:
            self._write_history(history)

        # Final weights are the last trained epoch's (reference keeps the
        # last epoch, not the best).
        return FitResult(history, int(np.asarray(es[1])), bool(np.asarray(es[3])))

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
