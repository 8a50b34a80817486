"""Audio codec tests: STFT/mel/db conventions vs NumPy oracles, NNLS +
Griffin-Lim reconstruction fidelity."""

import numpy as np
import pytest

from decode_tonal_langauge_tpu.ops import griffinlim as gl
from decode_tonal_langauge_tpu.ops import stft as stft_mod
from decode_tonal_langauge_tpu.utils import audio


def _harmonic(sr=8000, dur=0.512, f0=220.0):
    # dur chosen so the sample count is hop-aligned (exact iSTFT roundtrip)
    t = np.arange(int(sr * dur)) / sr
    return (
        np.sin(2 * np.pi * f0 * t)
        + 0.5 * np.sin(2 * np.pi * 2 * f0 * t)
        + 0.25 * np.sin(2 * np.pi * 3 * f0 * t)
    ).astype(np.float32)


class TestSTFT:
    def test_against_numpy_oracle(self, rng):
        y = rng.standard_normal(2000).astype(np.float32)
        n_fft, hop = 256, 64
        ours = np.asarray(stft_mod.stft(y, n_fft, hop))

        # oracle: centered zero-pad, periodic hann, rfft frames
        ypad = np.pad(y, (n_fft // 2, n_fft // 2))
        win = 0.5 * (1 - np.cos(2 * np.pi * np.arange(n_fft) / n_fft))
        n_frames = 1 + (len(ypad) - n_fft) // hop
        ref = np.stack(
            [
                np.fft.rfft(ypad[i * hop : i * hop + n_fft] * win)
                for i in range(n_frames)
            ]
        ).T
        assert ours.shape == ref.shape
        np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=1e-3)

    def test_istft_roundtrip(self, rng):
        y = rng.standard_normal(4096).astype(np.float32)  # hop-aligned
        n_fft, hop = 512, 128
        X = stft_mod.stft(y, n_fft, hop)
        y_rec = np.asarray(stft_mod.istft(X, n_fft, hop, length=len(y)))
        np.testing.assert_allclose(y_rec, y, rtol=1e-3, atol=1e-3)


class TestMelFilterbank:
    def test_shape_and_coverage(self):
        fb = stft_mod.mel_filterbank(8000, 512, n_mels=40)
        assert fb.shape == (40, 257)
        assert (fb >= 0).all()
        # every filter has some support
        assert (fb.sum(axis=1) > 0).all()

    def test_slaney_mel_scale_anchors(self):
        # linear region: 1000 Hz -> 15 mels exactly
        assert stft_mod.hz_to_mel(np.array(1000.0)) == pytest.approx(15.0)
        assert stft_mod.mel_to_hz(np.array(15.0)) == pytest.approx(1000.0)
        # round trip
        f = np.array([55.0, 440.0, 2000.0, 7999.0])
        np.testing.assert_allclose(
            stft_mod.mel_to_hz(stft_mod.hz_to_mel(f)), f, rtol=1e-10
        )

    def test_slaney_normalisation(self):
        # with slaney norm the filter areas (trapezoid) are ~uniform: peak
        # value * half base = 1 -> sum * df ~ 1
        fb = stft_mod.mel_filterbank(8000, 2048, n_mels=20)
        df = 8000 / 2 / (fb.shape[1] - 1)
        areas = fb.sum(axis=1) * df
        np.testing.assert_allclose(areas, 1.0, rtol=0.1)


class TestDb:
    def test_power_db_roundtrip(self, rng):
        S = rng.random((10, 20)).astype(np.float32) + 0.1
        db = np.asarray(stft_mod.power_to_db(S, ref=1.0, top_db=None))
        np.testing.assert_allclose(db, 10 * np.log10(S), rtol=1e-3, atol=1e-3)
        back = np.asarray(stft_mod.db_to_power(db, ref=1.0))
        np.testing.assert_allclose(back, S, rtol=1e-3)

    def test_ref_max_and_topdb(self, rng):
        S = np.abs(rng.random((5, 5))).astype(np.float32)
        db = np.asarray(stft_mod.power_to_db(S))
        assert db.max() == pytest.approx(0.0, abs=1e-4)
        assert db.min() >= -80.0 - 1e-4


class TestNNLS:
    def test_recovers_nonnegative_solution(self, rng):
        A = np.abs(rng.random((30, 10))).astype(np.float32)
        X_true = np.abs(rng.random((10, 7))).astype(np.float32)
        B = A @ X_true
        X = np.asarray(gl.nnls_project(A, B, n_iter=300))
        assert (X >= 0).all()
        np.testing.assert_allclose(A @ X, B, rtol=0.05, atol=0.01)


class TestGriffinLim:
    def test_magnitude_recovery(self):
        y = _harmonic()
        n_fft, hop = 512, 128
        S_mag = np.abs(np.asarray(stft_mod.stft(y, n_fft, hop)))
        rec = np.asarray(
            gl.griffinlim(S_mag, n_fft=n_fft, hop_length=hop, n_iter=40,
                          length=len(y))
        )
        S_rec = np.abs(np.asarray(stft_mod.stft(rec, n_fft, hop)))
        r = np.corrcoef(S_mag.ravel(), S_rec.ravel())[0, 1]
        assert r > 0.98


class TestAudioCodec:
    def test_mel_roundtrip_fidelity(self):
        sr = 8000
        y = _harmonic(sr=sr)
        kwargs = dict(n_fft=512, hop_length=128, n_mels=64)
        mel_flat = audio.audio_to_mel(y, sr, mel_kwargs=kwargs)
        assert mel_flat.ndim == 1

        wave = audio.mel_to_audio(
            mel_flat, n_mels=64, audio_sampling_rate=sr,
            n_fft=512, hop_length=128, n_iter=20, length=len(y),
        )
        assert wave.shape == y.shape
        # spectral fidelity: mel of reconstruction correlates with original
        mel_rec = audio.audio_to_mel(wave, sr, mel_kwargs=kwargs)
        m1 = mel_flat.reshape(64, -1)
        m2 = mel_rec.reshape(64, -1)
        r = np.corrcoef(m1.ravel(), m2.ravel())[0, 1]
        assert r > 0.85

    def test_audio_to_mel_rejects_2d(self, rng):
        with pytest.raises(ValueError):
            audio.audio_to_mel(rng.random((2, 100)), 8000)

    def test_batched_inverse_matches_per_trial(self, rng):
        """mels_to_audio (one vmapped dispatch) must reproduce the
        per-trial mel_to_audio outputs exactly (same seed-0 init phase)."""
        sr = 8000
        kwargs = dict(n_fft=512, hop_length=128, n_mels=32)
        mels = np.stack([
            audio.audio_to_mel(
                _harmonic(sr=sr) * (1.0 + 0.2 * i), sr, mel_kwargs=kwargs
            )
            for i in range(3)
        ])
        batched = audio.mels_to_audio(
            mels, n_mels=32, audio_sampling_rate=sr,
            n_fft=512, hop_length=128, n_iter=8,
        )
        assert batched.shape[0] == 3
        for i in range(3):
            single = audio.mel_to_audio(
                mels[i], n_mels=32, audio_sampling_rate=sr,
                n_fft=512, hop_length=128, n_iter=8,
            )
            np.testing.assert_allclose(
                batched[i], single, rtol=1e-4, atol=1e-5
            )

    def test_batched_inverse_rejects_1d(self, rng):
        with pytest.raises(ValueError, match="batch"):
            audio.mels_to_audio(rng.random(64), n_mels=8)

    def test_write_wav(self, tmp_path):
        audio.write_wav(str(tmp_path / "t.wav"), _harmonic(), 8000)
        from scipy.io import wavfile

        sr, data = wavfile.read(tmp_path / "t.wav")
        assert sr == 8000 and len(data) == len(_harmonic())
