"""Preprocess stage tests: plugin steps, preprocessor core, subject/block
pipeline over a synthetic subject."""

import os
from argparse import Namespace

import numpy as np
import pytest
import scipy.signal as sps

from decode_tonal_langauge_tpu.config import dict_to_namespace
from decode_tonal_langauge_tpu.data.synthetic import SyntheticSpec, write_subject
from decode_tonal_langauge_tpu.preprocess import main as preprocess_main
from decode_tonal_langauge_tpu.preprocess import preprocessor
from decode_tonal_langauge_tpu.preprocess.signal import (
    channel_zscore,
    downsample,
    frequency_filter,
    zscore_rereference,
)


def test_downsample_updates_signal_freq(rng):
    data = rng.standard_normal((4, 2000)).astype(np.float32)
    params = Namespace(signal_freq=1000.0, downsample_freq=400)
    out = downsample.run(data, params)
    assert params.signal_freq == 400
    assert out.shape == (4, 800)
    ref = sps.resample(data.astype(np.float64), 800, axis=1)
    np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-4)


def test_frequency_filter_band_concat(rng):
    data = rng.standard_normal((3, 1000)).astype(np.float32)
    params = Namespace(
        signal_freq=400.0,
        bands=[
            {"method": "hilbert", "params": {"freq_ranges": [70, 150], "envelope": True}},
            {"method": "butter", "params": {"freqs": [0.3, 100], "filter_type": "bandpass"}},
        ],
    )
    out = frequency_filter.run(data, params)
    assert out.shape == (6, 1000)  # both bands concatenated over channels


def test_frequency_filter_requires_bands(rng):
    with pytest.raises(ValueError):
        frequency_filter.run(
            rng.standard_normal((2, 100)), Namespace(signal_freq=400.0, bands=None)
        )


def test_zscore_rereference_step(rng):
    data = rng.standard_normal((3, 1000)).astype(np.float32) + 5.0
    params = Namespace(signal_freq=100.0, rereference_interval=[0.0, 2.0])
    out = zscore_rereference.run(data, params)
    ref_mu = data[:, :200].mean(axis=1, keepdims=True)
    ref_sd = data[:, :200].std(axis=1, keepdims=True)
    np.testing.assert_allclose(out, (data - ref_mu) / ref_sd, rtol=1e-4, atol=1e-4)


def test_preprocessor_param_collision(rng):
    data = rng.standard_normal((2, 500)).astype(np.float32)
    params = Namespace(signal_freq=400.0)
    steps = [
        {"module": "channel_zscore", "params": {"preserve_nans": True}},
        {"module": "channel_zscore", "params": {"preserve_nans": False}},
    ]
    with pytest.raises(ValueError, match="already exists"):
        preprocessor.preprocess_signal(data, steps, params)


def test_preprocess_modalities_injects_sf(rng):
    data_dict = {
        "ecog": rng.standard_normal((2, 2000)).astype(np.float32),
        "ecog_sf": 1000.0,
        "audio": rng.standard_normal((1, 4000)).astype(np.float32),
        "audio_sf": 2000.0,
    }
    modalities_cfg = {
        "ecog": {
            "type": "signal",
            "preprocessing": {
                "steps": [{"module": "downsample", "params": {"downsample_freq": 400}}]
            },
        },
        "audio": {"type": "signal"},  # no steps: untouched
    }
    out = preprocessor.preprocess_modalities(
        data_dict, modalities_cfg, dict_to_namespace({})
    )
    assert out["ecog_sf"] == 400
    assert out["ecog"].shape == (2, 800)
    assert out["audio"].shape == (1, 4000)  # untouched


def test_subject_block_pipeline_end_to_end(tmp_path):
    spec = SyntheticSpec(n_channels=8, n_blocks=2, trials_per_block=4,
                         ecog_sf=500.0, audio_sf=1000.0)
    write_subject(str(tmp_path / "raw"), 1, spec)

    config = {
        "preprocess": {
            "module": "preprocess_main",
            "params": {
                "pipeline": {
                    "module": "preprocess.pipelines.subject_block",
                    "params": {
                        "subject_dirs": ["Sub1"],
                        "subject_ids": [1],
                        "figures": False,
                    },
                },
                "io": {
                    "module": "preprocess.io.npz_blocks",
                    "params": {
                        "root_dir": str(tmp_path / "raw"),
                        "output_dir": str(tmp_path / "processed"),
                    },
                },
                "preprocessor": {"module": "preprocess.preprocessor"},
                "modalities": {
                    "ecog": {
                        "type": "signal",
                        "preprocessing": {
                            "steps": [
                                {"module": "downsample", "params": {"downsample_freq": 250}},
                                {
                                    "module": "frequency_filter",
                                    "params": {
                                        "bands": [
                                            {
                                                "method": "hilbert",
                                                "params": {
                                                    "freq_ranges": [70, 110],
                                                    "envelope": True,
                                                },
                                            }
                                        ]
                                    },
                                },
                                {
                                    "module": "zscore_rereference",
                                    "params": {"rereference_interval": [0.0, 5.0]},
                                },
                            ]
                        },
                    },
                    "audio": {"type": "signal"},
                },
            },
        }
    }

    setup_dir = preprocess_main.run(config)
    assert os.path.exists(os.path.join(setup_dir, "config.yaml"))
    subj_dir = os.path.join(setup_dir, "subject_1")
    for block in (1, 2):
        ecog_file = os.path.join(subj_dir, f"B{block}_ecog.npz")
        audio_file = os.path.join(subj_dir, f"B{block}_audio.npz")
        assert os.path.exists(ecog_file) and os.path.exists(audio_file)
        ecog = np.load(ecog_file)
        assert float(ecog["sf"]) == 250
        assert ecog["data"].shape[0] == 8
        # high-gamma envelope is non-negative-ish after z-score? envelope was
        # z-scored, so just check it is finite and correct length
        assert np.isfinite(ecog["data"]).all()

    # re-run: same hashed setup dir reused, no error
    setup_dir2 = preprocess_main.run(config)
    assert setup_dir2 == setup_dir


def _stage_config(raw_dir, out_dir, parallel=None):
    config = {
        "preprocess": {
            "module": "preprocess_main",
            "params": {
                "pipeline": {
                    "module": "preprocess.pipelines.subject_block",
                    "params": {
                        "subject_dirs": ["Sub1"],
                        "subject_ids": [1],
                        "figures": False,
                    },
                },
                "io": {
                    "module": "preprocess.io.npz_blocks",
                    "params": {
                        "root_dir": raw_dir,
                        "output_dir": out_dir,
                    },
                },
                "preprocessor": {"module": "preprocess.preprocessor"},
                "modalities": {
                    "ecog": {
                        "type": "signal",
                        "preprocessing": {
                            "steps": [
                                {
                                    "module": "downsample",
                                    "params": {"downsample_freq": 250},
                                },
                                {
                                    "module": "frequency_filter",
                                    "params": {
                                        "bands": [
                                            {
                                                "method": "hilbert",
                                                "params": {
                                                    "freq_ranges": [70, 110],
                                                    "envelope": True,
                                                },
                                            }
                                        ]
                                    },
                                },
                                {
                                    "module": "zscore_rereference",
                                    "params": {
                                        "rereference_interval": [0.0, 5.0]
                                    },
                                },
                            ]
                        },
                    },
                    "audio": {"type": "signal"},
                },
            },
        }
    }
    if parallel is not None:
        config["parallel"] = parallel
    return config


def test_mesh_parallel_stage_matches_single_device(tmp_path, monkeypatch):
    """parallel: {data: 8} round-robins blocks across the mesh's devices;
    every device must receive work and the stage outputs must equal the
    single-device run's (the per-block computation is placement-
    independent). SURVEY §7's device-sharded blockwise filtering."""
    import jax

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")

    spec = SyntheticSpec(n_channels=8, n_blocks=8, trials_per_block=2,
                         ecog_sf=500.0, audio_sf=1000.0)
    write_subject(str(tmp_path / "raw"), 1, spec)

    single_dir = preprocess_main.run(
        _stage_config(str(tmp_path / "raw"), str(tmp_path / "single"))
    )

    from decode_tonal_langauge_tpu.preprocess import preprocessor

    seen_devices = []
    orig = preprocessor.preprocess_signal

    def spy(data, steps, block_params, figure_dir=None, device=None, **kw):
        seen_devices.append(device)
        return orig(
            data, steps, block_params, figure_dir=figure_dir,
            device=device, **kw,
        )

    monkeypatch.setattr(preprocessor, "preprocess_signal", spy)
    meshed_dir = preprocess_main.run(
        _stage_config(
            str(tmp_path / "raw"), str(tmp_path / "meshed"),
            parallel={"data": 8},
        )
    )

    # all 8 devices held work (8 blocks x 2 modalities, round-robin)
    assert {d.id for d in seen_devices if d is not None} == set(range(8))

    for block in range(1, 9):
        for mod in ("ecog", "audio"):
            a = np.load(
                os.path.join(single_dir, "subject_1", f"B{block}_{mod}.npz")
            )
            b = np.load(
                os.path.join(meshed_dir, "subject_1", f"B{block}_{mod}.npz")
            )
            assert float(a["sf"]) == float(b["sf"])
            np.testing.assert_allclose(
                a["data"], b["data"], rtol=1e-6, atol=1e-7
            )


def test_stage_custom_plugin_without_device_kwarg(tmp_path, capsys):
    """A custom preprocessor plugin with the reference's 4-arg
    preprocess_modalities must keep working when parallel: is set (the
    stage degrades to single-device with a notice)."""
    import sys
    import types

    import jax

    if len(jax.devices()) < 2:
        pytest.skip("needs 2+ devices")

    from decode_tonal_langauge_tpu import registry
    from decode_tonal_langauge_tpu.preprocess import preprocessor

    legacy = types.ModuleType("legacy_preprocessor")

    def preprocess_modalities(data_dict, modalities_cfg, base_params,
                              figure_dir=None):
        return preprocessor.preprocess_modalities(
            data_dict, modalities_cfg, base_params, figure_dir=figure_dir
        )

    legacy.preprocess_modalities = preprocess_modalities
    sys.modules["legacy_preprocessor"] = legacy
    try:
        spec = SyntheticSpec(n_channels=4, n_blocks=2, trials_per_block=2,
                             ecog_sf=500.0, audio_sf=1000.0)
        write_subject(str(tmp_path / "raw"), 1, spec)
        config = _stage_config(
            str(tmp_path / "raw"), str(tmp_path / "out"),
            parallel={"data": 2},
        )
        config["preprocess"]["params"]["preprocessor"] = {
            "module": "legacy_preprocessor"
        }
        setup_dir = preprocess_main.run(config)
        assert os.path.exists(
            os.path.join(setup_dir, "subject_1", "B1_ecog.npz")
        )
        assert "single-device" in capsys.readouterr().out
    finally:
        del sys.modules["legacy_preprocessor"]


def test_single_local_device_plugin_without_device_kwarg(tmp_path, capsys):
    """Multi-process meshes hand the pipeline a LENGTH-1 local devices
    list (one chip per host). A legacy plugin without the `device` kwarg
    must be demoted — not crashed with an unexpected-kwarg TypeError —
    in that case too (regression: the demotion used to trigger only for
    len(devices) > 1)."""
    import types

    import jax

    from decode_tonal_langauge_tpu.config import dict_to_namespace
    from decode_tonal_langauge_tpu.preprocess.io import npz_blocks
    from decode_tonal_langauge_tpu.preprocess import preprocessor
    from decode_tonal_langauge_tpu.preprocess.pipelines import subject_block

    legacy = types.ModuleType("legacy_preprocessor_one_dev")

    def preprocess_modalities(data_dict, modalities_cfg, base_params,
                              figure_dir=None):
        return preprocessor.preprocess_modalities(
            data_dict, modalities_cfg, base_params, figure_dir=figure_dir
        )

    legacy.preprocess_modalities = preprocess_modalities

    spec = SyntheticSpec(n_channels=4, n_blocks=1, trials_per_block=2,
                         ecog_sf=500.0, audio_sf=1000.0)
    write_subject(str(tmp_path / "raw"), 1, spec)

    pipeline_params = dict_to_namespace({
        "subject_dirs": ["Sub1"],
        "subject_ids": [1],
        "figures": False,
    })
    io_params = dict_to_namespace({
        "root_dir": str(tmp_path / "raw"),
        "output_dir": str(tmp_path / "out"),
    })
    modalities_cfg = {"ecog": {"type": "signal"}, "audio": {"type": "signal"}}

    setup_dir = subject_block.run(
        pipeline_params, io_params, npz_blocks, legacy, modalities_cfg,
        devices=[jax.devices()[0]],
    )
    assert os.path.exists(os.path.join(setup_dir, "subject_1", "B1_ecog.npz"))
    assert "single-device" in capsys.readouterr().out


class TestFusedChain:
    """preprocess_signal's one-dispatch fused path: numerics equal to the
    per-step eager path, cached across blocks, eager fallback for
    non-traceable plugins."""

    STEPS = [
        {"module": "downsample", "params": {"downsample_freq": 200}},
        {
            "module": "frequency_filter",
            "params": {
                "bands": [
                    {
                        "method": "hilbert",
                        "params": {"freq_ranges": [30, 60], "envelope": True},
                    }
                ]
            },
        },
        {"module": "zscore_rereference", "params": {"rereference_interval": [0.0, 1.0]}},
    ]

    def test_fused_matches_stepwise(self, rng, tmp_path):
        data = rng.standard_normal((3, 2000)).astype(np.float32)
        fused, freq_fused = preprocessor.preprocess_signal(
            data, self.STEPS, Namespace(signal_freq=400.0)
        )
        # figure_dir forces the per-step eager path
        fig_dir = str(tmp_path / "figs")
        os.makedirs(fig_dir, exist_ok=True)
        stepwise, freq_step = preprocessor.preprocess_signal(
            data, self.STEPS, Namespace(signal_freq=400.0), figure_dir=fig_dir
        )
        assert freq_fused == freq_step == 200
        np.testing.assert_allclose(
            np.asarray(fused), np.asarray(stepwise), rtol=1e-5, atol=1e-5
        )

    def test_chain_is_cached(self, rng):
        data = rng.standard_normal((3, 2000)).astype(np.float32)
        preprocessor.preprocess_signal(
            data, self.STEPS, Namespace(signal_freq=400.0)
        )
        n_before = len(preprocessor._FUSED_CHAINS)
        # same steps/shape, different block ids -> cache hit
        preprocessor.preprocess_signal(
            data, self.STEPS,
            Namespace(signal_freq=400.0, block_id=7, subject_id=2),
        )
        assert len(preprocessor._FUSED_CHAINS) == n_before

    def test_untraceable_plugin_falls_back(self, rng, monkeypatch):
        data = rng.standard_normal((2, 300)).astype(np.float32)

        class HostPlugin:
            @staticmethod
            def run(x, params):
                return np.asarray(x) * 2.0  # np.asarray(tracer) raises

        from decode_tonal_langauge_tpu import registry

        real_resolve = registry.resolve
        monkeypatch.setattr(
            registry,
            "resolve",
            lambda name: HostPlugin if name == "host_double" else real_resolve(name),
        )
        monkeypatch.setattr(
            preprocessor.registry,
            "resolve",
            lambda name: HostPlugin if name == "host_double" else real_resolve(name),
        )
        out, freq = preprocessor.preprocess_signal(
            data, [{"module": "host_double"}], Namespace(signal_freq=400.0)
        )
        np.testing.assert_allclose(np.asarray(out), data * 2.0)
        assert freq == 400.0


class TestTDTBackend:
    """Exercise the TDT tank reader against a stub `tdt` module (the real
    package reads proprietary hardware tanks and is not in this image).
    Contract: ``/root/reference/preprocess/io/tdt_blocks.py:6-35`` —
    stream EOG1 is the ECoG, the FIRST ANIN row is the audio, and
    save_block writes ``subject_<id>/B<block>_<mod>.npz`` with
    ``{data, sf}``."""

    def _stub_tdt(self, monkeypatch, ecog, audio, ecog_fs, audio_fs):
        import sys
        import types

        class _Stream:
            def __init__(self, data, fs):
                self.data = data
                self.fs = fs

        class _Streams:
            pass

        streams = _Streams()
        streams.EOG1 = _Stream(ecog, ecog_fs)
        streams.ANIN = _Stream(audio, audio_fs)
        block = types.SimpleNamespace(streams=streams)

        stub = types.ModuleType("tdt")
        calls = []

        def read_block(path):
            calls.append(path)
            return block

        stub.read_block = read_block
        monkeypatch.setitem(sys.modules, "tdt", stub)
        return calls

    def test_load_block_stream_selection(self, monkeypatch, rng):
        from decode_tonal_langauge_tpu.preprocess.io import tdt_blocks

        ecog = rng.standard_normal((8, 100)).astype(np.float32)
        audio = rng.standard_normal((4, 200)).astype(np.float32)
        calls = self._stub_tdt(monkeypatch, ecog, audio, 3051.76, 24414.0)

        data = tdt_blocks.load_block("/fake/tank/HS1-B2")
        assert calls == ["/fake/tank/HS1-B2"]
        np.testing.assert_array_equal(data["ecog"], ecog)
        # audio keeps ONLY the first ANIN row, still 2-D (1, T)
        np.testing.assert_array_equal(data["audio"], audio[:1, :])
        assert data["audio"].shape == (1, 200)
        assert data["ecog_sf"] == 3051.76
        assert data["audio_sf"] == 24414.0

    def test_save_block_npz_schema(self, monkeypatch, tmp_path, rng):
        from decode_tonal_langauge_tpu.preprocess.io import tdt_blocks

        ecog = rng.standard_normal((3, 50)).astype(np.float32)
        audio = rng.standard_normal((4, 80)).astype(np.float32)
        self._stub_tdt(monkeypatch, ecog, audio, 400.0, 800.0)
        data = tdt_blocks.load_block("/fake/tank/HS7-B3")

        tdt_blocks.save_block(str(tmp_path), 7, 3, data)
        sub = tmp_path / "subject_7"
        for mod, expect in (("ecog", ecog), ("audio", audio[:1, :])):
            f = np.load(sub / f"B3_{mod}.npz")
            assert set(f.files) == {"data", "sf"}
            np.testing.assert_array_equal(f["data"], expect)
        assert float(np.load(sub / "B3_ecog.npz")["sf"]) == 400.0
        assert float(np.load(sub / "B3_audio.npz")["sf"]) == 800.0

    def test_missing_tdt_package_errors_clearly(self, monkeypatch):
        import builtins
        import sys

        from decode_tonal_langauge_tpu.preprocess.io import tdt_blocks

        monkeypatch.delitem(sys.modules, "tdt", raising=False)
        real_import = builtins.__import__

        def no_tdt(name, *args, **kwargs):
            if name == "tdt":
                raise ImportError("No module named 'tdt'")
            return real_import(name, *args, **kwargs)

        monkeypatch.setattr(builtins, "__import__", no_tdt)
        with pytest.raises(ImportError, match="npz_blocks"):
            tdt_blocks.load_block("/fake/tank")
