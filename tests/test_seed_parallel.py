"""Seed-parallel training parity: the vmapped multi-seed fit must
reproduce the sequential per-seed fits (histories, early stopping,
predictions), single-device and with the seed axis sharded over the
8-device mesh."""

import os
from argparse import Namespace

import jax
import numpy as np
import pytest

from decode_tonal_langauge_tpu.data.splits import split_indices
from decode_tonal_langauge_tpu.models.simple import (
    LogisticRegressionClassifier,
    ShallowNNClassifier,
)
from decode_tonal_langauge_tpu.parallel.mesh import make_mesh
from decode_tonal_langauge_tpu.training.seed_parallel import SeedParallelTrainer
from decode_tonal_langauge_tpu.training.trainer import ClassifierTrainer

SEEDS = [3, 17, 42, 101]
HP = dict(learning_rate=1e-2, batch_size=16, max_epochs=6, patience=2)


def _make_data(rng, n=96, d=12, n_classes=3):
    x = rng.standard_normal((n, d)).astype(np.float32)
    y = rng.integers(0, n_classes, n).astype(np.int32)
    for c in range(n_classes):
        x[y == c, c] += 1.5
    return x, y


def _split_stacks(x, y, seeds):
    tr_x, tr_y, va_x, va_y, te_x, te_y = ([] for _ in range(6))
    for seed in seeds:
        tr, va, te = split_indices(x.shape[0], [0.6, 0.2, 0.2], seed=seed)
        tr_x.append(x[tr]); tr_y.append(y[tr])
        va_x.append(x[va]); va_y.append(y[va])
        te_x.append(x[te]); te_y.append(y[te])
    return tuple(np.stack(a) for a in (tr_x, tr_y, va_x, va_y, te_x, te_y))


def _sequential(model, n_classes, seeds, stacks):
    tr_x, tr_y, va_x, va_y, te_x, te_y = stacks
    out = []
    for i, seed in enumerate(seeds):
        trainer = ClassifierTrainer(
            model, n_classes=n_classes, seed=seed, **HP
        )
        res = trainer.fit(tr_x[i], tr_y[i], va_x[i], va_y[i])
        preds = trainer.predict(te_x[i])
        out.append((res, preds))
    return out


@pytest.mark.parametrize(
    "model_fn,n_classes",
    [
        (lambda: LogisticRegressionClassifier(input_dim=12, n_classes=3), 3),
        (lambda: ShallowNNClassifier(input_dim=12, n_classes=3, hidden_dim=8), 3),
    ],
    ids=["logistic", "shallow"],
)
def test_vmapped_fit_matches_sequential(rng, model_fn, n_classes):
    x, y = _make_data(rng, n_classes=n_classes)
    stacks = _split_stacks(x, y, SEEDS)

    model = model_fn()
    spt = SeedParallelTrainer(model, n_classes=n_classes, seeds=SEEDS, **HP)
    par = spt.fit_eval(*stacks)
    seq = _sequential(model, n_classes, SEEDS, stacks)

    for res_p, (res_s, preds_s) in zip(par, seq):
        assert len(res_p.history) == len(res_s.history)
        assert res_p.best_epoch == res_s.best_epoch
        assert res_p.stopped_early == res_s.stopped_early
        for row_p, row_s in zip(res_p.history, res_s.history):
            for key in ("train/loss", "val/loss", "val/accuracy"):
                assert row_p[key] == pytest.approx(row_s[key], rel=2e-3, abs=2e-4), (
                    res_p.seed, row_p["epoch"], key
                )
        # Argmax predictions: allow <=2 tie flips out of ~20 samples.
        assert (res_p.test_preds != preds_s).sum() <= 2


def test_seed_axis_sharded_over_mesh(rng):
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    x, y = _make_data(rng, n=128)
    seeds = list(range(8))
    stacks = _split_stacks(x, y, seeds)
    mesh = make_mesh(8, axis_names=("data",))

    model = LogisticRegressionClassifier(input_dim=12, n_classes=3)
    par_meshed = SeedParallelTrainer(
        model, n_classes=3, seeds=seeds, mesh=mesh, **HP
    ).fit_eval(*stacks)
    par_single = SeedParallelTrainer(
        model, n_classes=3, seeds=seeds, **HP
    ).fit_eval(*stacks)

    for a, b in zip(par_meshed, par_single):
        assert a.best_epoch == b.best_epoch
        for row_a, row_b in zip(a.history, b.history):
            assert row_a["val/loss"] == pytest.approx(row_b["val/loss"], rel=2e-3)


def test_seed_count_not_divisible_by_mesh_pads_and_matches(rng):
    """Seeds (here 5) not divisible by the data axis (8): the seed axis
    pads to a dp multiple, still shards, and results equal the
    unsharded fit (padded seeds dropped)."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    x, y = _make_data(rng, n=128)
    seeds = [3, 17, 42, 101, 7]
    stacks = _split_stacks(x, y, seeds)
    mesh = make_mesh(8, axis_names=("data",))

    model = LogisticRegressionClassifier(input_dim=12, n_classes=3)
    par_meshed = SeedParallelTrainer(
        model, n_classes=3, seeds=seeds, mesh=mesh, **HP
    ).fit_eval(*stacks)
    par_single = SeedParallelTrainer(
        model, n_classes=3, seeds=seeds, **HP
    ).fit_eval(*stacks)

    assert len(par_meshed) == len(seeds)
    for a, b in zip(par_meshed, par_single):
        assert a.seed == b.seed
        assert a.best_epoch == b.best_epoch
        np.testing.assert_array_equal(a.test_preds, b.test_preds)
        for row_a, row_b in zip(a.history, b.history):
            assert row_a["val/loss"] == pytest.approx(
                row_b["val/loss"], rel=2e-3
            )


def test_multiprocess_mesh_requires_all_devices(monkeypatch):
    """A cross-host parallel: spec that doesn't span every global device
    must fail loudly (a partial global mesh reshape-crashes deep inside
    otherwise)."""
    from decode_tonal_langauge_tpu.parallel import mesh as mesh_mod

    monkeypatch.setattr(mesh_mod.jax, "process_count", lambda: 2)
    with pytest.raises(ValueError, match="all 8 global devices"):
        mesh_mod.mesh_from_config({"data": 4})


def test_pipeline_helper_parallel_vs_sequential(rng, tmp_path):
    """_fit_eval_all_seeds: the seed_parallel toggle must not change
    test predictions, and per-seed metrics.csv files must be written."""
    from decode_tonal_langauge_tpu.training.classifier_pipeline import (
        _fit_eval_all_seeds,
    )

    x, y = _make_data(rng)
    base = dict(
        model="models.simple_classifiers.LogisticRegressionClassifier",
        model_kwargs={},
        lr=1e-2,
        batch_size=16,
        epochs=5,
        patience=2,
        train_ratio=0.6,
        vali_ratio=0.2,
        test_ratio=0.2,
        verbose=0,
    )

    def run(parallel, sub):
        params = Namespace(**base, seed_parallel=parallel)
        return _fit_eval_all_seeds(
            params, x[:, :, None], y, 3, SEEDS,
            log_dir_fn=lambda seed: str(tmp_path / sub / f"seed_{seed}"),
        )

    par = run(True, "par")
    seq = run(False, "seq")
    for rp, rs in zip(par, seq):
        assert rp.seed == rs.seed
        assert rp.n_params == rs.n_params
        np.testing.assert_array_equal(rp.test_true, rs.test_true)
        assert (rp.test_preds != rs.test_preds).mean() <= 0.1
        assert os.path.exists(tmp_path / "par" / f"seed_{rp.seed}" / "metrics.csv")
        assert os.path.exists(
            tmp_path / "par" / f"seed_{rp.seed}" / "confusion_matrix_test.csv"
        )


def test_seed_chunk_matches_unchunked(rng):
    """seed_chunk bounds the vmapped width (HBM guard for wide seed
    counts on one chip); chunked per-seed results must equal the
    unchunked fit exactly — seeds are independent."""
    x, y = _make_data(rng)
    stacks = _split_stacks(x, y, SEEDS)
    model = LogisticRegressionClassifier(input_dim=x.shape[1], n_classes=3)

    full = SeedParallelTrainer(
        model, n_classes=3, seeds=SEEDS, **HP
    ).fit_eval(*stacks)
    chunked = SeedParallelTrainer(
        model, n_classes=3, seeds=SEEDS, seed_chunk=3, **HP
    ).fit_eval(*stacks)

    assert [r.seed for r in chunked] == [r.seed for r in full] == SEEDS
    for rf, rc in zip(full, chunked):
        assert len(rf.history) == len(rc.history)
        for hf, hc in zip(rf.history, rc.history):
            for k in hf:
                np.testing.assert_allclose(hf[k], hc[k], rtol=1e-6)
        np.testing.assert_array_equal(rf.test_preds, rc.test_preds)
        np.testing.assert_allclose(
            np.concatenate([np.ravel(l) for l in jax.tree_util.tree_leaves(rf.params)]),
            np.concatenate([np.ravel(l) for l in jax.tree_util.tree_leaves(rc.params)]),
            rtol=1e-6,
        )
