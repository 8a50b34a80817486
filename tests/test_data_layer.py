"""Data-layer tests: TextGrid parsing, alignment, epoch extraction, utils."""

import os

import numpy as np
import pytest

from decode_tonal_langauge_tpu.data import text_align, utils
from decode_tonal_langauge_tpu.data.extract_samples import run as extract_run
from decode_tonal_langauge_tpu.data.synthetic import SyntheticSpec, write_subject
from decode_tonal_langauge_tpu.data.textgrid import (
    Interval,
    IntervalTier,
    TextGrid,
    write_textgrid,
)


@pytest.fixture
def tg_file(tmp_path):
    tier = IntervalTier("success", 0.0, 10.0)
    tier.intervals = [
        Interval(0.0, 1.0, ""),
        Interval(1.0, 1.4, "1i"),
        Interval(1.4, 3.0, ""),
        Interval(3.0, 3.4, "4a"),
        Interval(3.4, 5.0, "note"),  # non-digit mark: ignored
        Interval(5.0, 5.4, "2a"),
    ]
    grid = TextGrid(0.0, 10.0, [tier])
    path = tmp_path / "B1.TextGrid"
    write_textgrid(grid, str(path))
    return str(path)


class TestTextGrid:
    def test_roundtrip(self, tg_file):
        grid = TextGrid.from_file(tg_file)
        assert grid.maxTime == 10.0
        assert len(grid.tiers) == 1
        tier = grid.tiers[0]
        assert tier.name == "success"
        assert len(tier.intervals) == 6
        assert tier.intervals[1].mark == "1i"
        assert tier.intervals[1].minTime == 1.0

    def test_get_textgrid_time(self, tg_file):
        from decode_tonal_langauge_tpu.data.text_align import get_textgrid_time

        grid = TextGrid.from_file(tg_file)
        assert get_textgrid_time(grid) == 5.4
        assert get_textgrid_time(grid, ["success"]) == 5.4
        assert get_textgrid_time(grid, ["nonexistent"]) == 0.0

    def test_handle_textgrids_reports_duration(self, tg_file, capsys):
        text_align.handle_textgrids(os.path.dirname(tg_file), 0.0, 0.0, None)
        assert "Maximum time for block 1" in capsys.readouterr().out

    def test_handle_textgrids(self, tg_file):
        data_dir = os.path.dirname(tg_file)
        intervals = text_align.handle_textgrids(data_dir, start_offset=0.2)
        assert list(intervals.keys()) == [1]
        df = intervals[1]
        assert len(df) == 3  # digit-marked only
        assert list(df["tone"]) == [1, 4, 2]
        assert list(df["syllable"]) == ["i", "a", "a"]
        # start_offset applied and rounded to 0.1s
        assert df["start"].iloc[0] == pytest.approx(0.8)

    def test_overlap_skipped(self, tmp_path):
        tier = IntervalTier("success", 0.0, 5.0)
        tier.intervals = [
            Interval(1.0, 2.0, "1i"),
            Interval(2.1, 3.0, "2a"),
        ]
        grid = TextGrid(0.0, 5.0, [tier])
        path = tmp_path / "B2.TextGrid"
        write_textgrid(grid, str(path))
        # end offset pushes first interval's end beyond the next start
        with pytest.warns(UserWarning, match="Overlapping"):
            df = text_align.read_textgrid(
                TextGrid.from_file(str(path)), 0.0, 0.5, None
            )
        assert len(df) == 1

    def test_block_filter(self, tg_file):
        data_dir = os.path.dirname(tg_file)
        assert text_align.handle_textgrids(data_dir, blocks=[7]) == {}


class TestUtils:
    def test_extract_block_id(self):
        assert utils.extract_block_id("HS25_B13.wav") == 13
        with pytest.raises(ValueError):
            utils.extract_block_id("nothing.wav")

    def test_match_filename(self):
        assert utils.match_filename("B1_ecog.npz", "npz", ["ecog"])
        assert not utils.match_filename("B1_ecog.npz", "wav", ["ecog"])
        assert not utils.match_filename("B1_ecog.npz", "npz", ["sound"])

    def test_prepare_tone_dynamics(self):
        mapping = {"0": [1, 2, 3], "1": [3, 2, 1]}
        out = utils.prepare_tone_dynamics(
            mapping, np.array([0, 1]), np.array([1, 0])
        )
        assert out.shape == (2, 2, 3)
        np.testing.assert_array_equal(out[0, 0], [1, 1, 1])  # syllable row
        np.testing.assert_array_equal(out[0, 1], [1, 2, 3])  # tone contour
        np.testing.assert_array_equal(out[1, 1], [3, 2, 1])

    def test_prepare_tone_dynamics_unknown_tone(self):
        with pytest.raises(ValueError, match="not found"):
            utils.prepare_tone_dynamics({"0": [1]}, np.array([5]), np.array([0]))

    def test_non_discriminative_selection(self):
        sel = {
            "active_channels": [0, 1, 2, 3, 4],
            "tone_discriminative": [1, 2],
            "syllable_discriminative": [2, 3],
        }
        out = utils.select_non_discriminative_channels(
            sel, ["tone_discriminative", "syllable_discriminative"]
        )
        assert out == [0, 4]


class TestExtractSamples:
    def test_stage_end_to_end(self, tmp_path):
        spec = SyntheticSpec(
            n_channels=6, n_blocks=2, trials_per_block=8,
            ecog_sf=500.0, audio_sf=1000.0,
        )
        raw_root = str(tmp_path / "raw")
        write_subject(raw_root, 1, spec)

        # emulate a preprocessed recording dir: copy raw into the reference
        # save-format (B<n>_ecog.npz / B<n>_audio.npz under subject_1/)
        from decode_tonal_langauge_tpu.preprocess.io import npz_blocks

        rec_dir = str(tmp_path / "processed")
        os.makedirs(rec_dir, exist_ok=True)
        for block in (1, 2):
            data = npz_blocks.load_block(
                os.path.join(raw_root, "Sub1", f"HS1-B{block}")
            )
            npz_blocks.save_block(rec_dir, 1, block, data)

        config = {
            "sample_collection": {
                "module": "extract_samples",
                "params": {
                    "io": {
                        "output_dir": str(tmp_path / "samples"),
                        "textgrid_root": raw_root,
                        "recording_dir": rec_dir,
                        "figures": False,
                    },
                    "subjects": {
                        1: {
                            "start_offset": 0.2,
                            "sample_length": 1.0,
                            "rest_period": [0.0, 5.0],
                            "textgrid_dir": "annotations/subject_1",
                            "tier_list": ["success"],
                        }
                    },
                    "settings": {"syllable_identifiers": ["i", "a"]},
                },
            }
        }

        out_dir = extract_run(config)
        sample_path = os.path.join(out_dir, "subject_1.npz")
        assert os.path.exists(sample_path)
        data = np.load(sample_path)

        n = 2 * spec.trials_per_block
        assert data["ecog"].shape == (n, 6, 500)
        assert data["audio"].shape == (n, 1000)
        assert data["syllable"].shape == (n,)
        assert data["tone"].shape == (n,)
        assert data["tone"].min() == 0  # shifted to 0-base
        assert set(np.unique(data["syllable"])) <= {0, 1}
        assert data["ecog_rest"].shape[1:] == (6, 500)
        assert float(data["ecog_sf"]) == 500.0

        # skip-if-exists: the hashed stage cache must not recompute
        mtime = os.path.getmtime(sample_path)
        out_dir2 = extract_run(config)
        assert out_dir2 == out_dir
        assert os.path.getmtime(sample_path) == mtime

        # overwrite forces re-extraction into the same hashed dir
        config["sample_collection"]["params"]["io"]["overwrite"] = True
        out_dir3 = extract_run(config)
        assert out_dir3 == out_dir
        assert os.path.getmtime(sample_path) >= mtime
        data2 = np.load(os.path.join(out_dir3, "subject_1.npz"))
        np.testing.assert_array_equal(data2["tone"], data["tone"])

        # a changed extraction setting must hash to a DIFFERENT dir
        config["sample_collection"]["params"]["io"]["overwrite"] = False
        config["sample_collection"]["params"]["subjects"][1]["sample_length"] = 0.5
        out_dir4 = extract_run(config)
        assert out_dir4 != out_dir

        # ... and so must a different annotation source (same dir names)
        from decode_tonal_langauge_tpu.data.extract_samples import (
            _generate_output_dir_name,
        )

        other = {"sample_collection": dict(config["sample_collection"])}
        other["sample_collection"]["params"] = dict(
            config["sample_collection"]["params"]
        )
        other["sample_collection"]["params"]["io"] = {
            **config["sample_collection"]["params"]["io"],
            "textgrid_root": "/elsewhere/annotations",
        }
        assert _generate_output_dir_name(
            "base", other["sample_collection"]
        ) != _generate_output_dir_name("base", config["sample_collection"])

    def test_epoch_alignment_values(self, tmp_path):
        # hand-built recording with a ramp so slicing is verifiable
        rec_dir = str(tmp_path / "rec")
        os.makedirs(rec_dir)
        sf = 100.0
        t = np.arange(3000)
        ecog = np.stack([t, -t]).astype(np.float32)
        np.savez(os.path.join(rec_dir, "B1_ecog.npz"), data=ecog, sf=sf)
        audio = t[None, :].astype(np.float32)
        np.savez(os.path.join(rec_dir, "B1_audio.npz"), data=audio, sf=sf)

        import pandas as pd

        intervals = {1: pd.DataFrame([
            {"start": 10.0, "end": 10.4, "syllable": "i", "tone": 1},
            {"start": 12.0, "end": 12.4, "syllable": "a", "tone": 3},
        ])}
        out = text_align.extract_ecog_audio(
            intervals, rec_dir, syllables=["i", "a"], length=1.0,
        )
        np.testing.assert_array_equal(out["ecog"][0, 0], t[1000:1100])
        np.testing.assert_array_equal(out["audio"][1], t[1200:1300])
        np.testing.assert_array_equal(out["tone"], [0, 2])
        np.testing.assert_array_equal(out["syllable"], [0, 1])


class TestUnlabelledCollector:
    """Sliding-window self-supervised collector
    (parity with /root/reference/data_loading/dataloaders.py:77-170)."""

    def _write(self, d, name, c=3, t=500):
        rng = np.random.default_rng(hash(name) % 2**31)
        data = rng.standard_normal((c, t)).astype(np.float32)
        np.savez(os.path.join(d, name), data=data, sf=100.0)
        return data

    def test_windows_match_naive_loop(self, tmp_path):
        from decode_tonal_langauge_tpu.data.unlabelled import (
            collect_unlabelled_samples,
            sliding_window_patches,
        )

        data = self._write(tmp_path, "B1_ecog.npz")
        seg, patch, step = 64, 16, 32
        got = collect_unlabelled_samples(str(tmp_path), patch, seg, step)

        expected = []
        for start in range(0, data.shape[1] - seg + 1, step):
            segment = data[:, start : start + seg]
            expected.append(segment.reshape(data.shape[0], seg // patch, patch))
        expected = np.stack(expected)
        np.testing.assert_array_equal(got, expected)
        # and the stride-view helper agrees with the public API
        np.testing.assert_array_equal(
            sliding_window_patches(data, patch, seg, step), expected
        )

    def test_default_step_is_half_segment(self, tmp_path):
        from decode_tonal_langauge_tpu.data.unlabelled import (
            collect_unlabelled_samples,
        )

        self._write(tmp_path, "B1_ecog.npz", t=200)
        got = collect_unlabelled_samples(str(tmp_path), 10, 100)
        assert got.shape == (3, 3, 10, 10)  # starts 0, 50, 100

    def test_kword_filter_and_multi_file(self, tmp_path):
        from decode_tonal_langauge_tpu.data.unlabelled import (
            collect_unlabelled_samples,
        )

        self._write(tmp_path, "B1_ecog.npz", t=128)
        self._write(tmp_path, "B2_ecog.npz", t=128)
        self._write(tmp_path, "B1_audio.npz", t=128)
        got = collect_unlabelled_samples(
            str(tmp_path), 8, 64, 64, kwords=["ecog"]
        )
        assert got.shape == (4, 3, 8, 8)  # 2 windows per ecog file

    def test_indivisible_segment_raises(self, tmp_path):
        from decode_tonal_langauge_tpu.data.unlabelled import (
            collect_unlabelled_samples,
        )

        self._write(tmp_path, "B1_ecog.npz")
        with pytest.raises(ValueError, match="multiple"):
            collect_unlabelled_samples(str(tmp_path), 7, 64)

    def test_empty_folder_raises(self, tmp_path):
        from decode_tonal_langauge_tpu.data.unlabelled import (
            collect_unlabelled_samples,
        )

        with pytest.raises(ValueError, match="No unlabelled samples"):
            collect_unlabelled_samples(str(tmp_path), 8, 64)
