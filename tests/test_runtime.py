"""Runtime subsystem tests: profiling hooks and Orbax checkpoint round-trip."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from decode_tonal_langauge_tpu.runtime import checkpoint, profiling


class TestProfiling:
    def test_timed_returns_result_and_rate(self):
        f = jax.jit(lambda x: x * 2.0)
        x = jnp.ones((8, 8))
        result, per_call = profiling.timed(f, x, warmup=1, repeats=3)
        np.testing.assert_allclose(np.asarray(result), 2.0)
        assert per_call > 0

    def test_stage_timer_accumulates_and_summarises(self):
        timer = profiling.StageTimer()
        with timer.span("a"):
            pass
        with timer.span("a"):
            pass
        with timer.span("b"):
            pass
        assert set(timer.spans) == {"a", "b"}
        summary = timer.summary()
        assert "a:" in summary and "%" in summary

    def test_trace_noop_without_dir(self):
        with profiling.trace(None):
            jnp.ones(3).sum()

    def test_trace_writes_profile(self, tmp_path):
        with profiling.trace(str(tmp_path)):
            jax.jit(lambda x: x + 1)(jnp.ones(4)).sum()
        # jax writes plugins/profile/<ts>/*.pb under the trace dir
        found = [
            os.path.join(dirpath, f)
            for dirpath, _, files in os.walk(tmp_path)
            for f in files
        ]
        assert found, "profiler trace produced no files"


class TestCheckpoint:
    def test_params_roundtrip(self, tmp_path, rng):
        tree = {
            "dense": {
                "kernel": jnp.asarray(
                    rng.standard_normal((4, 3)).astype(np.float32)
                ),
                "bias": jnp.zeros(3),
            },
            "scale": jnp.float32(2.5),
        }
        path = checkpoint.save_params(str(tmp_path / "ckpt"), tree)
        restored = checkpoint.load_params(path)
        assert jax.tree_util.tree_structure(
            restored
        ) == jax.tree_util.tree_structure(tree)
        for a, b in zip(
            jax.tree_util.tree_leaves(tree), jax.tree_util.tree_leaves(restored)
        ):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_roundtrip_with_like_structure(self, tmp_path, rng):
        tree = {"w": jnp.asarray(rng.standard_normal((2, 2)).astype(np.float32))}
        path = checkpoint.save_params(str(tmp_path / "ckpt2"), tree)
        restored = checkpoint.load_params(path, like=tree)
        np.testing.assert_array_equal(np.asarray(restored["w"]), np.asarray(tree["w"]))
        assert restored["w"].dtype == tree["w"].dtype

    def test_trainer_checkpoint_resume(self, tmp_path, rng):
        """Save a trained classifier's params and restore into a fresh
        trainer: predictions must match (the synthesizer's pretrained-load
        path)."""
        from decode_tonal_langauge_tpu.models.simple import (
            LogisticRegressionClassifier,
        )
        from decode_tonal_langauge_tpu.training.trainer import ClassifierTrainer

        x = rng.standard_normal((32, 8)).astype(np.float32)
        y = rng.integers(0, 2, 32).astype(np.int32)
        x[y == 1] += 2.0

        model = LogisticRegressionClassifier(input_dim=8, n_classes=2)
        t1 = ClassifierTrainer(model, n_classes=2, batch_size=8, max_epochs=3)
        t1.fit(x, y, x, y)
        path = checkpoint.save_params(str(tmp_path / "clf"), t1.params)

        t2 = ClassifierTrainer(model, n_classes=2, batch_size=8)
        t2.init(x)
        t2.params = checkpoint.load_params(path, like=t2.params)
        np.testing.assert_array_equal(t1.predict(x), t2.predict(x))


class TestDonation:
    """jit-donation / alias correctness (SURVEY §5's sanitizer stand-in):
    the whole-fit jits donate the training-state buffers; results must be
    bitwise-deterministic and the donated inputs must either be released
    (TPU) or left untouched (backends that ignore donation)."""

    def _fit_once(self, x, y):
        from decode_tonal_langauge_tpu.models.simple import (
            LogisticRegressionClassifier,
        )
        from decode_tonal_langauge_tpu.training.trainer import ClassifierTrainer

        model = LogisticRegressionClassifier(input_dim=8, n_classes=2)
        trainer = ClassifierTrainer(
            model, n_classes=2, batch_size=8, max_epochs=4, seed=0,
            learning_rate=1e-2,
        )
        trainer.init(x)
        pre_params = trainer.params
        pre_copy = jax.tree_util.tree_map(
            lambda leaf: np.array(leaf), pre_params
        )
        res = trainer.fit(x[:24], y[:24], x[24:], y[24:])
        return res, pre_params, pre_copy, trainer

    def test_fit_deterministic_under_donation(self, rng):
        x = rng.standard_normal((32, 8)).astype(np.float32)
        y = rng.integers(0, 2, 32).astype(np.int32)
        r1, _, _, t1 = self._fit_once(x, y)
        r2, _, _, t2 = self._fit_once(x, y)
        assert [row["train/loss"] for row in r1.history] == [
            row["train/loss"] for row in r2.history
        ]
        for a, b in zip(
            jax.tree_util.tree_leaves(t1.params),
            jax.tree_util.tree_leaves(t2.params),
        ):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_donated_inputs_released_or_untouched(self, rng):
        x = rng.standard_normal((32, 8)).astype(np.float32)
        y = rng.integers(0, 2, 32).astype(np.int32)
        _, pre_params, pre_copy, trainer = self._fit_once(x, y)
        for leaf, copy in zip(
            jax.tree_util.tree_leaves(pre_params),
            jax.tree_util.tree_leaves(pre_copy),
        ):
            try:
                value = np.asarray(leaf)
            except RuntimeError:
                continue  # buffer donated and deleted — the TPU behavior
            # donation ignored on this backend: the old buffer must be
            # byte-identical to its pre-fit snapshot (no aliasing bug)
            np.testing.assert_array_equal(value, copy)
        # and the trainer's post-fit params are NOT the donated objects
        assert trainer.params is not pre_params


def test_set_seeds_contract():
    """set_seeds mirrors the reference utility: numpy global stream
    seeded (reference seed-draw compatibility) + a root JAX key back
    (``/root/reference/utils/utils.py:6-20``)."""
    import jax
    import numpy as np

    from decode_tonal_langauge_tpu.utils.seeding import set_seeds

    key = set_seeds(123)
    a = np.random.randint(0, 10000, 3)
    set_seeds(123)
    b = np.random.randint(0, 10000, 3)
    np.testing.assert_array_equal(a, b)
    k1, k2 = jax.random.split(key)
    assert k1.shape == key.shape


class TestCompilationCache:
    """runtime/compilation_cache.py: the persistent-compile-cache switch
    wired into the pipeline runner and both CLIs (re-runs with unchanged
    shapes must skip jit compiles; measured 0.62 s -> 0.02 s across
    processes on the tunneled TPU backend)."""

    def test_respects_existing_configuration(self):
        # conftest points JAX at /tmp/jax_cache; the default-on product
        # path must NOT clobber a user/test-configured cache dir.
        import jax

        from decode_tonal_langauge_tpu.runtime.compilation_cache import (
            enable_compilation_cache,
        )

        before = jax.config.jax_compilation_cache_dir
        assert before  # conftest configured it
        assert enable_compilation_cache(True) == before
        assert jax.config.jax_compilation_cache_dir == before

    def test_false_disables_without_touching_config(self):
        import jax

        from decode_tonal_langauge_tpu.runtime.compilation_cache import (
            enable_compilation_cache,
        )

        before = jax.config.jax_compilation_cache_dir
        assert enable_compilation_cache(False) is None
        assert jax.config.jax_compilation_cache_dir == before

    def test_explicit_path_wins_and_creates_dir(self, tmp_path):
        import jax

        from decode_tonal_langauge_tpu.runtime.compilation_cache import (
            enable_compilation_cache,
        )

        before = jax.config.jax_compilation_cache_dir
        target = str(tmp_path / "xla_cache")
        try:
            assert enable_compilation_cache(target) == target
            assert os.path.isdir(target)
            assert jax.config.jax_compilation_cache_dir == target
        finally:
            jax.config.update("jax_compilation_cache_dir", before)


def test_seed_stream_matches_reference_global_draw():
    """seed_stream must reproduce the reference's np.random.seed +
    randint draw bit-for-bit — training, evaluation, and serving all
    key checkpoints by these seeds."""
    import numpy as np

    from decode_tonal_langauge_tpu.utils.seeding import seed_stream

    np.random.seed(42)
    reference_draw = np.random.randint(0, 10000, 6)
    np.testing.assert_array_equal(seed_stream(42, 6), reference_draw)
    # and it must NOT disturb the global stream
    np.random.seed(7)
    before = np.random.get_state()[1].copy()
    seed_stream(123, 4)
    np.testing.assert_array_equal(np.random.get_state()[1], before)


class TestBenchBackendProbe:
    """bench._require_backend must survive a tunnel FLAP: probe attempts
    run in fresh subprocesses (an in-process hang is unrecoverable) and
    retry with backoff until the budget runs out (r4's single-shot probe
    lost the round's numbers to a transient outage)."""

    def _bench(self):
        import sys

        sys.path.insert(0, "/root/repo")
        import bench

        return bench

    def test_retries_until_probe_succeeds(self, monkeypatch):
        bench = self._bench()
        calls = []

        def flaky_probe(timeout_s):
            calls.append(timeout_s)
            return len(calls) >= 3  # two failures, then the tunnel is back

        monkeypatch.setattr(bench, "_probe_backend_subprocess", flaky_probe)
        monkeypatch.setattr(bench.time, "sleep", lambda s: None)
        # succeeds without os._exit: the main-process init watchdog runs
        # against the conftest CPU backend, which inits instantly
        bench._require_backend(total_budget_s=60, attempt_timeout_s=5)
        assert len(calls) == 3

    def test_gives_up_with_json_error_after_budget(self, monkeypatch, capfd):
        bench = self._bench()
        import json as _json

        monkeypatch.setattr(
            bench, "_probe_backend_subprocess", lambda t: False
        )
        monkeypatch.setattr(bench.time, "sleep", lambda s: None)
        exits = []
        monkeypatch.setattr(os, "_exit", lambda rc: exits.append(rc))

        # freeze out the real clock: two attempts then budget exhausted
        ticks = iter([0.0, 0.0, 5.0, 5.0, 11.0, 11.0, 11.0, 11.0])
        monkeypatch.setattr(
            bench.time, "monotonic", lambda: next(ticks, 99.0)
        )
        bench._require_backend(total_budget_s=10, attempt_timeout_s=5)
        assert exits == [2]
        err = _json.loads(capfd.readouterr().out.strip().splitlines()[-1])
        assert "TPU tunnel down" in err["error"]
