"""Mesh / sharding tests on the virtual 8-device CPU mesh: shard shapes,
DP-vs-single-device parity, model-parallel dense head, and the graft
dryrun."""

import sys

import jax
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from decode_tonal_langauge_tpu.models.simple import LogisticRegressionClassifier
from decode_tonal_langauge_tpu.parallel.mesh import (
    make_mesh,
    replicate,
    shard_batch,
)
from decode_tonal_langauge_tpu.parallel.train_step import (
    build_sharded_classifier_step,
    dense_head_sharding,
)
from decode_tonal_langauge_tpu.training.optim import nadam_with_decay_groups


@pytest.fixture(scope="module")
def devices_8():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return jax.devices()[:8]


class TestMesh:
    def test_make_mesh_shapes(self, devices_8):
        mesh = make_mesh(8, axis_names=("data",))
        assert mesh.devices.shape == (8,)
        mesh2 = make_mesh(8, axis_names=("data", "model"))
        assert mesh2.devices.shape == (4, 2)

    def test_shard_batch_places_shards(self, devices_8, rng):
        mesh = make_mesh(8, axis_names=("data",))
        x = rng.standard_normal((16, 4)).astype(np.float32)
        xs = shard_batch(mesh, x)
        # each device holds 16/8 = 2 rows
        shard_shapes = {s.data.shape for s in xs.addressable_shards}
        assert shard_shapes == {(2, 4)}

    def test_replicate(self, devices_8, rng):
        mesh = make_mesh(8, axis_names=("data",))
        tree = {"w": rng.standard_normal((3, 3)).astype(np.float32)}
        rep = replicate(mesh, tree)
        assert rep["w"].sharding.is_fully_replicated


class TestShardedTraining:
    def _setup(self, rng, mesh):
        n, d = 64, 32
        x = rng.standard_normal((n, d)).astype(np.float32)
        y = rng.integers(0, 2, n).astype(np.int32)
        x[y == 1] += 1.0
        model = LogisticRegressionClassifier(input_dim=d, n_classes=2)
        variables = model.init({"params": jax.random.key(0)}, x[:1], train=False)
        optimizer = nadam_with_decay_groups(1e-2)
        return model, variables["params"], optimizer, x, y

    def test_dp_matches_single_device(self, devices_8, rng):
        mesh = make_mesh(8, axis_names=("data",))
        model, params, optimizer, x, y = self._setup(rng, mesh)

        step = build_sharded_classifier_step(model, optimizer, mesh)

        # single device
        opt1 = optimizer.init(params)
        p1, _, loss1 = step(params, opt1, x, y, jax.random.key(1))

        # sharded over the mesh
        params_r = replicate(mesh, params)
        opt2 = replicate(mesh, optimizer.init(params))
        xs, ys = shard_batch(mesh, x), shard_batch(mesh, y)
        p2, _, loss2 = step(params_r, opt2, xs, ys, jax.random.key(1))

        assert float(loss1) == pytest.approx(float(loss2), rel=1e-5)
        for a, b in zip(
            jax.tree_util.tree_leaves(p1), jax.tree_util.tree_leaves(p2)
        ):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4,
                                       atol=1e-6)

    def test_model_parallel_dense_sharding(self, devices_8, rng):
        mesh = make_mesh(8, axis_names=("data", "model"))
        from decode_tonal_langauge_tpu.models.deep import CNNClassifier

        model = CNNClassifier(input_channels=4, input_length=200, n_classes=4)
        x = rng.standard_normal((4, 4, 200)).astype(np.float32)
        variables = model.init({"params": jax.random.key(0)},
                               x[:1], train=False)
        shardings = dense_head_sharding(mesh, variables["params"])
        fc1 = shardings["fc1"]["kernel"]
        assert fc1.spec == P(None, "model")
        conv = shardings["convs_0"]["kernel"]
        assert conv.spec == P()


class TestTrainerWithMesh:
    """The production ClassifierTrainer must give the same numbers meshed
    and unmeshed (DP is a layout decision, not a math change)."""

    def _data(self, rng, n=48, d=16):
        x = rng.standard_normal((n, d)).astype(np.float32)
        y = rng.integers(0, 2, n).astype(np.int32)
        x[y == 1] += 1.0
        return x, y

    def test_fit_parity_meshed_vs_single(self, devices_8, rng):
        from decode_tonal_langauge_tpu.training.trainer import ClassifierTrainer

        x, y = self._data(rng)
        mesh = make_mesh(8, axis_names=("data",))

        def run(mesh):
            model = LogisticRegressionClassifier(input_dim=16, n_classes=2)
            trainer = ClassifierTrainer(
                model, n_classes=2, batch_size=16, max_epochs=3, seed=0,
                mesh=mesh,
            )
            res = trainer.fit(x[:32], y[:32], x[32:], y[32:])
            return res.history

    # identical seeds/batching -> loss curves agree to float tolerance
        h_single = run(None)
        h_meshed = run(mesh)
        for a, b in zip(h_single, h_meshed):
            assert a["train/loss"] == pytest.approx(b["train/loss"], rel=1e-4)
            assert a["val/loss"] == pytest.approx(b["val/loss"], rel=1e-4)

    def test_meshed_batch_is_actually_sharded(self, devices_8, rng):
        from decode_tonal_langauge_tpu.training.trainer import ClassifierTrainer

        mesh = make_mesh(8, axis_names=("data",))
        model = LogisticRegressionClassifier(input_dim=16, n_classes=2)
        trainer = ClassifierTrainer(
            model, n_classes=2, batch_size=8, max_epochs=1, mesh=mesh
        )
        x, y = self._data(rng)
        xb, yb, wb = trainer._place_stacks(
            np.zeros((2, 8, 16), np.float32),
            np.zeros((2, 8), np.int32),
            np.ones((2, 8), np.float32),
        )
        shard_shapes = {s.data.shape for s in xb.addressable_shards}
        assert shard_shapes == {(2, 1, 16)}

    def test_batch_size_rounds_to_data_axis(self, devices_8):
        from decode_tonal_langauge_tpu.training.trainer import ClassifierTrainer

        mesh = make_mesh(8, axis_names=("data",))
        model = LogisticRegressionClassifier(input_dim=4, n_classes=2)
        trainer = ClassifierTrainer(model, n_classes=2, batch_size=5, mesh=mesh)
        assert trainer.batch_size == 8


class TestBatchStatsStep:
    def test_sharded_step_with_batchnorm(self, devices_8, rng):
        import flax.linen as nn
        import jax.numpy as jnp

        class BNClassifier(nn.Module):
            n_classes: int = 2

            @nn.compact
            def __call__(self, x, train: bool = False):
                x = nn.Dense(8)(x)
                x = nn.BatchNorm(use_running_average=not train)(x)
                return nn.Dense(self.n_classes)(x)

        mesh = make_mesh(8, axis_names=("data",))
        model = BNClassifier()
        x = rng.standard_normal((16, 4)).astype(np.float32)
        y = rng.integers(0, 2, 16).astype(np.int32)
        variables = model.init({"params": jax.random.key(0)}, x[:1], train=False)
        optimizer = nadam_with_decay_groups(1e-2)

        step = build_sharded_classifier_step(
            model, optimizer, mesh, has_batch_stats=True
        )
        params = replicate(mesh, variables["params"])
        batch_stats = replicate(mesh, variables["batch_stats"])
        opt = replicate(mesh, optimizer.init(variables["params"]))
        xs, ys = shard_batch(mesh, x), shard_batch(mesh, y)
        params, new_bs, opt, loss = step(
            params, batch_stats, opt, xs, ys, jax.random.key(1)
        )
        assert np.isfinite(float(loss))
        # running stats must actually update
        before = jax.tree_util.tree_leaves(batch_stats)
        after = jax.tree_util.tree_leaves(new_bs)
        assert any(
            not np.allclose(np.asarray(a), np.asarray(b))
            for a, b in zip(before, after)
        )


class TestDistributed:
    """Multi-host helpers (single-process semantics + explicit-arg math)."""

    def test_host_shard_single_process_is_identity(self):
        from decode_tonal_langauge_tpu.parallel.distributed import host_shard

        items = ["a", "b", "c"]
        assert host_shard(items) == items

    def test_host_shard_round_robin(self):
        from decode_tonal_langauge_tpu.parallel.distributed import host_shard

        items = list(range(10))
        shards = [host_shard(items, p, 3) for p in range(3)]
        assert shards[0] == [0, 3, 6, 9]
        assert shards[1] == [1, 4, 7]
        assert shards[2] == [2, 5, 8]
        # partition property: disjoint and complete
        assert sorted(sum(shards, [])) == items

    def test_host_shard_bad_process_id(self):
        from decode_tonal_langauge_tpu.parallel.distributed import host_shard

        with pytest.raises(ValueError):
            host_shard([1, 2], process_id=5, process_count=2)

    def test_initialize_noop_without_cluster(self, monkeypatch):
        from decode_tonal_langauge_tpu.parallel import distributed

        monkeypatch.delenv("JAX_COORDINATOR_ADDRESS", raising=False)
        assert distributed.initialize() is False

    def test_global_mesh_over_all_devices(self, devices_8):
        from decode_tonal_langauge_tpu.parallel.distributed import global_mesh

        mesh = global_mesh(("data",))
        assert mesh.devices.size == len(jax.devices())
        mesh2 = global_mesh(("data", "device"))
        assert mesh2.devices.shape == (
            len(jax.devices()) // jax.local_device_count(),
            jax.local_device_count(),
        )

    def test_barrier_noop_single_process(self):
        from decode_tonal_langauge_tpu.parallel.distributed import barrier

        barrier("test")  # must not raise or hang


class TestGraftEntry:
    def test_entry_forward(self):
        sys.path.insert(0, "/root/repo")
        import __graft_entry__ as ge

        fn, args = ge.entry()
        out = fn(*args)
        assert out.shape == (16, 2)

    def test_dryrun_multichip_tunnel_proof(self, tmp_path):
        """The full dryrun must complete even when importing jax in the
        PARENT would hang — the round-4 MULTICHIP failure, where the
        tunneled backend's init hung with the tunnel down. Simulated by a
        poisoned `jax` package first on PYTHONPATH that sleeps forever on
        import: the parent must never import it (handoff to the clean CPU
        child is decided by an env marker alone), and the child strips
        PYTHONPATH so it gets the real jax."""
        import os
        import subprocess

        poison = tmp_path / "poison" / "jax"
        poison.mkdir(parents=True)
        poison.joinpath("__init__.py").write_text(
            "import sys, time\n"
            "print('POISONED-JAX-IMPORTED', flush=True)\n"
            "time.sleep(600)\n"
        )
        env = dict(os.environ)
        env["PYTHONPATH"] = f"{poison.parent}:/root/repo"
        code = (
            "import __graft_entry__ as ge\n"
            "ge.dryrun_multichip(8)\n"
            "print('DRYRUN-PARENT-OK')\n"
        )
        result = subprocess.run(
            [sys.executable, "-c", code],
            env=env,
            capture_output=True,
            text=True,
            # Must exceed the dryrun's own child budget (540 s) so a
            # stalled section fails THERE with its attributable
            # per-section message, not here as a bare TimeoutExpired.
            timeout=600,
        )
        tail = result.stdout[-3000:] + result.stderr[-3000:]
        assert result.returncode == 0, tail
        assert "DRYRUN-PARENT-OK" in result.stdout, tail
        assert "POISONED-JAX-IMPORTED" not in result.stdout, (
            "the dryrun parent imported jax — a hanging backend init "
            "would have killed it"
        )
        # every section ran and reported its wall time
        for section in (
            "sharded-train-step", "production-trainer", "seed-parallel",
            "mesh-preprocess", "synthesis-trainer", "serving-decode",
            "pipeline-e2e-parallel",
        ):
            assert f"[dryrun] section {section}: ok" in result.stdout, (
                f"section {section} missing from dryrun output:\n{tail}"
            )


class TestMeshFromConfig:
    """The YAML `parallel:` section -> mesh (VERDICT r2 item #2)."""

    def test_absent_or_single_is_none(self):
        from decode_tonal_langauge_tpu.parallel.mesh import mesh_from_config

        assert mesh_from_config(None) is None
        assert mesh_from_config({}) is None
        assert mesh_from_config({"data": 1}) is None

    def test_auto_spans_all_devices(self, devices_8):
        from decode_tonal_langauge_tpu.parallel.mesh import mesh_from_config

        mesh = mesh_from_config("auto")
        assert dict(mesh.shape) == {"data": len(jax.devices())}
        mesh2 = mesh_from_config({"data": "auto", "model": 2})
        assert dict(mesh2.shape) == {"data": len(jax.devices()) // 2, "model": 2}

    def test_explicit_counts(self, devices_8):
        from decode_tonal_langauge_tpu.parallel.mesh import mesh_from_config

        mesh = mesh_from_config({"data": 4})
        assert dict(mesh.shape) == {"data": 4}

    def test_oversubscription_raises(self, devices_8):
        from decode_tonal_langauge_tpu.parallel.mesh import mesh_from_config

        with pytest.raises(ValueError):
            mesh_from_config({"data": 1024})
        with pytest.raises(ValueError):
            mesh_from_config("not-a-mapping")


class TestTrainingStageWithMesh:
    """train_classifier.run with a config-declared mesh must reproduce the
    single-device results (DP + seed-parallel are layout decisions)."""

    def _config(self, tmp_path, sub, parallel):
        rng = np.random.default_rng(7)
        n = 64
        x = rng.standard_normal((n, 6, 10)).astype(np.float32)
        syll = np.tile([0, 1], n // 2)
        tone = np.tile([0, 1, 2, 3], n // 4)
        x[syll == 1] += 4.0
        sample_dir = tmp_path / sub / "samples"
        sample_dir.mkdir(parents=True)
        np.savez(
            sample_dir / "subject_1.npz",
            ecog=x, ecog_sf=100.0, syllable=syll, tone=tone,
        )
        return {
            "parallel": parallel,
            "model": {
                "model": "models.simple_classifiers.LogisticRegressionClassifier",
                "model_name": "logistic",
                "model_kwargs": {},
            },
            "training": {
                "module": "train_classifier",
                "params": {
                    "io": {
                        "log_dir": str(tmp_path / sub / "logs"),
                        "sample_dir": str(sample_dir),
                    },
                    "experiment": {
                        "targets": ["syllable"],
                        "features": "ecog",
                        "separate_models": False,
                        "seed": 42,
                        "repeat": 2,
                        "verbose": 0,
                    },
                    "training": {
                        "train_ratio": 0.6,
                        "vali_ratio": 0.2,
                        "test_ratio": 0.2,
                        "batch_size": 8,
                        "epochs": 30,
                        "lr": 0.01,
                        "standardize": True,
                        "patience": 30,
                    },
                },
            },
            "evaluation": {"metrics": ["accuracy"]},
        }

    def test_meshed_stage_matches_single(self, devices_8, tmp_path):
        import pandas as pd

        from decode_tonal_langauge_tpu.training import train_classifier

        out_single = train_classifier.run(self._config(tmp_path, "single", None))
        out_meshed = train_classifier.run(
            self._config(tmp_path, "meshed", {"data": 8})
        )
        r_single = pd.read_csv(f"{out_single}/results.csv")
        r_meshed = pd.read_csv(f"{out_meshed}/results.csv")
        assert r_meshed["accuracy_mean"].iloc[0] == pytest.approx(
            r_single["accuracy_mean"].iloc[0], abs=0.05
        )
        assert r_meshed["accuracy_mean"].iloc[0] > 0.8


class TestShardedSynthesisStep:
    """build_sharded_synthesis_step on the paper SynthesisModelCNN:
    meshed DP must match single-device numerics (VERDICT r2 item #5)."""

    def test_synthcnn_mesh_parity(self, devices_8, rng):
        import jax.numpy as jnp
        import optax

        from decode_tonal_langauge_tpu.models.synthesis import SynthesisModelCNN
        from decode_tonal_langauge_tpu.parallel.train_step import (
            build_sharded_synthesis_step,
        )

        b, c, t, n_dyn, out_dim = 16, 8, 64, 12, 40
        ecog = rng.standard_normal((b, c, t)).astype(np.float32)
        labels = rng.standard_normal((b, 2, n_dyn)).astype(np.float32)
        mel = rng.standard_normal((b, out_dim)).astype(np.float32)

        model = SynthesisModelCNN(output_dim=out_dim, n_channels=c, n_timepoints=t)
        params0 = model.init(
            {"params": jax.random.key(0)},
            jnp.asarray(ecog), jnp.asarray(labels), train=False,
        )["params"]
        optimizer = optax.adam(1e-3)

        def run(mesh):
            params = params0
            opt_state = optimizer.init(params)
            if mesh is not None:
                step = build_sharded_synthesis_step(model, optimizer, mesh)
            else:
                def step(params, opt_state, ecog, labels, targets, rng_):
                    def loss_fn(p):
                        out = model.apply(
                            {"params": p}, ecog, labels, train=True,
                            rngs={"dropout": rng_},
                        )
                        return jnp.abs(out - targets).mean()

                    loss, grads = jax.value_and_grad(loss_fn)(params)
                    updates, opt_state2 = optimizer.update(grads, opt_state, params)
                    return optax.apply_updates(params, updates), opt_state2, loss

            losses = []
            for i in range(3):
                params, opt_state, loss = step(
                    params, opt_state, ecog, labels, mel, jax.random.key(i)
                )
                losses.append(float(loss))
            return losses

        mesh = make_mesh(8, axis_names=("data",))
        single = run(None)
        meshed = run(mesh)
        for a, b_ in zip(single, meshed):
            assert a == pytest.approx(b_, rel=1e-4)
