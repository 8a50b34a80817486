"""Channel-selection tests: active / discriminative plugins + stage entry,
cross-checked against per-channel SciPy loops."""

import json
import os

import numpy as np
import pytest
import scipy.stats as spstats

from decode_tonal_langauge_tpu.channel_selection import active, discriminative, utils
from decode_tonal_langauge_tpu.channel_selection.main import run as stage_run


def _dataset(rng, n_channels=12, t=100, sf=100.0):
    """ERP/rest dataset with known active + discriminative channels."""
    rest = rng.standard_normal((20, n_channels, t)).astype(np.float32)
    erp = rng.standard_normal((40, n_channels, t)).astype(np.float32)
    # Balanced crossed design: every (tone, syllable) pair appears equally
    # often, so tone grouping is orthogonal to the syllable effect.
    tones = np.tile(np.arange(4), 10)
    sylls = np.tile(np.repeat(np.arange(2), 4), 5)

    active_set = [ch for ch in (0, 1, 2, 3, 4, 5) if ch < n_channels]
    tone_set = [ch for ch in (0, 1) if ch < n_channels]
    syll_set = [ch for ch in (2, 3) if ch < n_channels]

    for ch in active_set:
        erp[:, ch, 20:80] += 2.0  # event-locked offset
    for ch in tone_set:
        erp[:, ch, 30:70] += tones[:, None] * 1.5
    for ch in syll_set:
        erp[:, ch, 30:70] += sylls[:, None] * 2.5

    return {
        "ecog": erp,
        "ecog_rest": rest,
        "ecog_sf": np.asarray(sf),
        "tone": tones,
        "syllable": sylls,
    }, active_set, tone_set, syll_set


class TestActive:
    def test_finds_planted_channels(self, rng):
        data, active_set, _, _ = _dataset(rng)
        res = active.run(
            data, {"p_threshold": 0.01, "active_time_threshold": 0.2}
        )
        assert set(res["selected_channels"]) == set(active_set)
        assert res["p_values"].shape == data["ecog"].shape[1:]
        assert len(res["max_lengths"]) == len(res["selected_channels"])

    def test_matches_scipy_loop(self, rng):
        data, _, _, _ = _dataset(rng, n_channels=5)
        res = active.run(data, {"p_threshold": 0.05, "active_time_threshold": 0.1})
        for ch in range(5):
            ref = spstats.f_oneway(
                data["ecog_rest"][:, ch, :].astype(np.float64),
                data["ecog"][:, ch, :].astype(np.float64),
            )
            np.testing.assert_allclose(
                res["p_values"][ch], ref.pvalue, rtol=2e-2, atol=1e-4
            )

    def test_missing_keys(self, rng):
        with pytest.raises(ValueError):
            active.run({"ecog": np.zeros((2, 2, 2))}, {"p_threshold": 0.01,
                                                       "active_time_threshold": 0.1})


class TestDiscriminative:
    def test_finds_planted_channels(self, rng):
        data, _, tone_set, syll_set = _dataset(rng)
        res_tone = discriminative.run(
            data,
            {"p_threshold": 0.01, "active_time_threshold": 0.2, "label": "tone"},
        )
        res_syll = discriminative.run(
            data,
            {"p_threshold": 0.01, "active_time_threshold": 0.2, "target": "syllable"},
        )
        assert set(res_tone["selected_channels"]) == set(tone_set)
        assert set(res_syll["selected_channels"]) == set(syll_set)

    def test_matches_scipy_loop(self, rng):
        data, _, _, _ = _dataset(rng, n_channels=4)
        res = discriminative.test_discriminative_power(
            data, {"target": "tone", "recording_name": "ecog"}
        )
        for ch in range(4):
            groups = [
                data["ecog"][data["tone"] == g, ch, :].astype(np.float64)
                for g in range(4)
            ]
            ref = spstats.f_oneway(*groups, axis=0)
            np.testing.assert_allclose(
                res["p_value"][ch], ref.pvalue, rtol=3e-2, atol=1e-4
            )

    def test_requires_target(self, rng):
        data, _, _, _ = _dataset(rng, n_channels=3)
        with pytest.raises(KeyError):
            discriminative.run(data, {"p_threshold": 0.01, "active_time_threshold": 0.1})


class TestUtils:
    def test_get_max_length(self):
        assert utils.get_max_length(np.array([1, 2, 3, 7, 8])) == 3
        assert utils.get_max_length(np.array([])) == 0

    def test_find_significant_channels_fills_lengths(self):
        p = np.ones((3, 100))
        p[1, 10:40] = 1e-8  # 30-long significant run
        channels, lengths = utils.find_significant_channels(
            p, pvalue_threshold=0.05, length_threshold=10
        )
        assert channels == [1]
        assert lengths == [30]


class TestStage:
    def test_stage_writes_json(self, rng, tmp_path):
        data, active_set, tone_set, syll_set = _dataset(rng)
        sample_dir = tmp_path / "samples"
        sample_dir.mkdir()
        np.savez(sample_dir / "subject_1.npz", **data)

        config = {
            "channel_selection": {
                "module": "channel_selection_main",
                "params": {
                    "io": {
                        "sample_dir": str(sample_dir),
                        "output_dir": str(tmp_path / "sel"),
                        "figures": False,
                    },
                    "selections": [
                        {
                            "module": "channel_selection.active",
                            "selection_name": "active_channels",
                            "params": {
                                "p_threshold": 0.01,
                                "active_time_threshold": 0.2,
                                "rest_name": "ecog_rest",
                                "erp_name": "ecog",
                            },
                        },
                        {
                            "module": "channel_selection.discriminative",
                            "selection_name": "tone_discriminative",
                            "params": {
                                "p_threshold": 0.01,
                                "active_time_threshold": 0.2,
                                "label": "tone",
                                "recording_name": "ecog",
                            },
                        },
                        {
                            "module": "channel_selection.discriminative",
                            "selection_name": "syllable_discriminative",
                            "params": {
                                "p_threshold": 0.01,
                                "active_time_threshold": 0.2,
                                "label": "syllable",
                                "recording_name": "ecog",
                            },
                        },
                    ],
                },
            }
        }

        out_dir = stage_run(config)
        with open(os.path.join(out_dir, "subject_1.json")) as f:
            results = json.load(f)
        assert set(results["active_channels"]) == set(active_set)
        assert set(results["tone_discriminative"]) == set(tone_set)
        assert set(results["syllable_discriminative"]) == set(syll_set)
        assert os.path.exists(os.path.join(out_dir, "config.yaml"))
