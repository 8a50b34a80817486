"""SciPy/pandas oracle tests for the core signal ops."""

import numpy as np
import pandas as pd
import pytest
import scipy.signal as sps

from decode_tonal_langauge_tpu.ops import fir, hilbert, iir, rereference, resample


def _sig(rng, c=4, t=2000):
    return rng.standard_normal((c, t)).astype(np.float32)


class TestResample:
    @pytest.mark.parametrize("num", [500, 512, 1999, 2000, 2501, 4000])
    def test_matches_scipy(self, rng, num):
        x = _sig(rng, 3, 2000)
        ours = np.asarray(resample.fft_resample(x, num))
        ref = sps.resample(x.astype(np.float64), num, axis=-1)
        np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=2e-4)

    def test_rate_helper_sample_count(self, rng):
        x = _sig(rng, 2, 3052)
        y = resample.resample_to_rate(x, 3052.0, 400.0)
        assert y.shape == (2, int(3052 * (400 / 3052)))

    @pytest.mark.parametrize("up,down", [(100, 763), (2, 3), (3, 1), (5, 7), (1, 4)])
    def test_polyphase_matches_scipy(self, rng, up, down):
        x = _sig(rng, 3, 2289)
        ours = np.asarray(resample.polyphase_resample(x, up, down))
        ref = sps.resample_poly(x.astype(np.float64), up, down, axis=-1)
        assert ours.shape == ref.shape
        np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)

    def test_polyphase_filter_matches_scipy_design(self):
        up, down = 4, 9
        ours = resample.resample_poly_filter(up, down)
        ref = sps.firwin(
            2 * 10 * max(up, down) + 1, 1.0 / max(up, down), window=("kaiser", 5.0)
        ) * up
        np.testing.assert_allclose(ours, ref, rtol=1e-12, atol=1e-14)

    def test_rate_tail_is_computed_not_zero(self, rng):
        # When the rational approximation yields fewer samples than the
        # reference's int(T*target/orig) rule, the tail must be computed
        # from edge-padded input, not appended as literal zeros.
        t = 10007  # prime length provokes the length mismatch
        x = np.ones((2, t), dtype=np.float32)
        y = np.asarray(resample.resample_to_rate(x, 3051.7578125, 400.0))
        assert y.shape[-1] == int(t * 400.0 / 3051.7578125)
        # a constant signal resamples to ~1 everywhere, incl. the tail
        assert abs(float(y[:, -1].mean()) - 1.0) < 0.05

    def test_gather_path_for_odd_rational_rates(self, rng):
        # TDT hardware rates (3051.7578125 Hz) reduce to huge phase
        # counts (up=1109 here) that the conv formulation cannot fit in
        # VMEM; the gather path must kick in and keep scipy parity
        from fractions import Fraction

        x = _sig(rng, 2, 30518)
        y = np.asarray(resample.resample_to_rate(x, 3051.7578125, 400.0))
        fr = (Fraction(400) / Fraction(3051.7578125)).limit_denominator(10000)
        assert fr.numerator > resample._CONV_PHASE_LIMIT
        ref = sps.resample_poly(
            x.astype(np.float64), fr.numerator, fr.denominator, axis=-1
        )
        n = min(y.shape[-1], ref.shape[-1])
        np.testing.assert_allclose(y[:, :n], ref[:, :n], rtol=1e-4, atol=1e-5)

    def test_rate_helper_poly_long_signal(self, rng):
        # Above FFT_LENGTH_LIMIT the helper must auto-route to polyphase
        # and keep the reference's int() output-length rule.
        x = _sig(rng, 2, 30520)
        y = np.asarray(resample.resample_to_rate(x, 3052.0, 400.0))
        assert y.shape == (2, int(30520 * (400 / 3052)))
        ref = sps.resample_poly(x.astype(np.float64), 100, 763, axis=-1)
        np.testing.assert_allclose(y, ref[:, : y.shape[-1]], rtol=1e-4, atol=1e-5)


class TestHilbert:
    def _reference_hilbert(self, data, sr, freq_range, envelope=True):
        """Independent NumPy re-derivation of the reference filter bank
        (cf. /root/reference/preprocess/signal/frequency_filter.py:80-184)."""
        import math

        c, t = data.shape
        centers, sigmas = hilbert.gaussian_bank_params([freq_range])
        freqs = np.fft.fftfreq(t, d=1.0 / sr)
        mult = hilbert.hilbert_multiplier(t)
        out = np.zeros((c, t, len(centers)))
        dfft = np.fft.fft(data, axis=1)
        for i, (fc, sf) in enumerate(zip(centers, sigmas)):
            H = np.exp(-0.5 * ((freqs - fc) / sf) ** 2)
            H[0] = 0
            k = H * mult
            for ch in range(c):
                sig = np.fft.ifft(dfft[ch] * k)
                out[ch, :, i] = np.abs(sig) if envelope else sig.real
        return out.mean(axis=2)

    def test_bank_params_span_range(self):
        centers, sigmas = hilbert.gaussian_bank_params([(70.0, 150.0)])
        assert centers.min() >= 70.0
        assert centers.max() <= 150.0
        assert len(centers) == len(sigmas) > 3

    @pytest.mark.parametrize("envelope", [True, False])
    def test_matches_numpy_oracle(self, rng, envelope):
        x = _sig(rng, 3, 1024)
        sr = 400.0
        ours = np.asarray(
            hilbert.hilbert_filter(x, sr, [(70.0, 150.0)], envelope=envelope)
        )
        ref = self._reference_hilbert(x.astype(np.float64), sr, (70.0, 150.0), envelope)
        np.testing.assert_allclose(ours, ref, rtol=5e-3, atol=5e-4)

    def test_envelope_of_pure_tone(self):
        # amplitude-modulated 100 Hz carrier: envelope should track |modulation|
        sr = 400.0
        t = np.arange(4096) / sr
        amp = 1.0 + 0.5 * np.sin(2 * np.pi * 0.5 * t)
        x = (amp * np.sin(2 * np.pi * 100.0 * t)).astype(np.float32)[None, :]
        env = np.asarray(hilbert.hilbert_filter(x, sr, [(70.0, 150.0)]))[0]
        # envelope is attenuated by the bank gain but must correlate strongly
        corr = np.corrcoef(env[200:-200], amp[200:-200])[0, 1]
        assert corr > 0.97


class TestIIR:
    def test_lfilter_matches_scipy(self, rng):
        b, a = sps.butter(4, [0.1, 0.4], btype="bandpass")
        x = _sig(rng, 3, 1500)
        ours = np.asarray(iir.lfilter(b, a, x))
        ref = sps.lfilter(b, a, x.astype(np.float64), axis=-1)
        np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=5e-4)

    def test_lfilter_with_zi(self, rng):
        b, a = sps.butter(2, 0.2)
        x = _sig(rng, 1, 400)[0]
        zi = sps.lfilter_zi(b, a)
        ours, zf = iir.lfilter(b, a, x, zi=zi.astype(np.float32) * x[0])
        ref, ref_zf = sps.lfilter(b, a, x.astype(np.float64), zi=zi * x[0])
        np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-3, atol=1e-4)
        np.testing.assert_allclose(np.asarray(zf), ref_zf, rtol=1e-3, atol=1e-4)

    def test_lfilter_long_zi_high_order_warns(self, rng):
        # order>2 + zi + long signal has no blocked path; it must warn
        # loudly before falling to the timestep scan (VERDICT r2 weak #5).
        import warnings

        b, a = sps.butter(4, 0.2)
        x = _sig(rng, 1, iir.IIR_SCAN_LIMIT + 8)[0]
        zi = np.zeros(4, dtype=np.float32)
        with warnings.catch_warnings(record=True) as caught:
            warnings.simplefilter("always")
            iir.lfilter(b, a, x, zi=zi)
        assert any("timestep scan" in str(w.message) for w in caught)

    def test_lfilter_pallas_matches_scipy(self, rng):
        """The Pallas DF2T kernel (interpret mode on this CPU backend):
        SciPy parity for y and zf, high order, with and without zi."""
        from decode_tonal_langauge_tpu.ops.pallas_iir import lfilter_pallas

        b, a = sps.butter(4, [0.1, 0.4], btype="bandpass")  # order-8 tf
        x = _sig(rng, 3, 1000)
        zi = sps.lfilter_zi(b, a)
        zi_x = (zi[None] * x[:, :1].astype(np.float64))

        ours, zf = lfilter_pallas(b, a, x, zi=zi_x.astype(np.float32))
        ref, ref_zf = sps.lfilter(b, a, x.astype(np.float64), zi=zi_x, axis=-1)
        np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-3, atol=1e-3)
        np.testing.assert_allclose(np.asarray(zf), ref_zf, rtol=1e-3, atol=1e-3)

        y2 = lfilter_pallas(b, a, x)
        ref2 = sps.lfilter(b, a, x.astype(np.float64), axis=-1)
        np.testing.assert_allclose(np.asarray(y2), ref2, rtol=1e-3, atol=1e-3)

    def test_lfilter_pallas_chunk_boundary_state(self, rng):
        """State must carry across time-chunk grid steps and freeze in
        the zero-padded tail (zf == state after the LAST real sample)."""
        from decode_tonal_langauge_tpu.ops import pallas_iir

        b, a = sps.butter(2, 0.3)
        t = pallas_iir._CHUNK + 37  # forces 2 grid steps + ragged tail
        x = _sig(rng, 1, t)
        ours, zf = pallas_iir.lfilter_pallas(
            b, a, x, zi=np.zeros((1, 2), np.float32)
        )
        ref, ref_zf = sps.lfilter(
            b, a, x.astype(np.float64), zi=np.zeros((1, 2)), axis=-1
        )
        np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-3, atol=1e-3)
        np.testing.assert_allclose(np.asarray(zf), ref_zf, rtol=1e-3, atol=1e-3)

    def test_filtfilt_matches_scipy(self, rng):
        b, a = sps.butter(4, [0.05, 0.45], btype="bandpass")
        x = _sig(rng, 3, 2000)
        ours = np.asarray(iir.filtfilt(b, a, x))
        ref = sps.filtfilt(b, a, x.astype(np.float64), axis=-1)
        np.testing.assert_allclose(ours, ref, rtol=5e-3, atol=5e-4)

    def test_sosfilt_matches_scipy(self, rng):
        sos = sps.butter(4, [0.1, 0.4], btype="bandpass", output="sos")
        x = _sig(rng, 3, 1200)
        ours = np.asarray(iir.sosfilt(sos, x))
        ref = sps.sosfilt(sos, x.astype(np.float64), axis=-1)
        np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=1e-4)

    def test_butter_filter_lowpass(self, rng):
        x = _sig(rng, 2, 1600)
        ours = np.asarray(
            iir.butter_filter(x, 50.0, fs=400.0, filter_type="lowpass")
        )
        b, a = sps.butter(4, 50.0 / 200.0, btype="lowpass")
        ref = sps.filtfilt(b, a, x.astype(np.float64), axis=-1)
        np.testing.assert_allclose(ours, ref, rtol=5e-3, atol=5e-4)


class TestIIRLongSignals:
    """Recording-length signals route to the block-state / frequency-domain
    kernels (a timestep scan is ~100x slower on TPU); parity vs SciPy."""

    def test_lfilter_blocked_matches_scipy(self, rng):
        b, a = sps.butter(2, [0.1, 0.4], btype="bandpass")
        x = _sig(rng, 3, 20000)
        assert x.shape[-1] > iir.IIR_SCAN_LIMIT
        ours = np.asarray(iir.lfilter(b, a, x))
        ref = sps.lfilter(b, a, x.astype(np.float64), axis=-1)
        np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=1e-4)

    def test_lfilter_blocked_with_zi_and_tail(self, rng):
        # 20001 is not a multiple of the block size: exercises the
        # remainder-tail scan and the final-state handoff
        b, a = sps.butter(2, 0.2)
        x = _sig(rng, 2, 20001)
        zi = sps.lfilter_zi(b, a).astype(np.float32)
        ours, zf = iir.lfilter(b, a, x, zi=zi * x[:, :1])
        ref, ref_zf = sps.lfilter(
            b, a, x.astype(np.float64), axis=-1,
            zi=zi[None, :] * x[:, :1].astype(np.float64),
        )
        np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-3, atol=1e-3)
        np.testing.assert_allclose(np.asarray(zf), ref_zf, rtol=1e-2, atol=1e-3)

    def test_sosfilt_blocked_matches_scipy(self, rng):
        sos = sps.butter(4, [0.1, 0.4], btype="bandpass", output="sos")
        x = _sig(rng, 2, 20000)
        ours = np.asarray(iir.sosfilt(sos, x))
        ref = sps.sosfilt(sos, x.astype(np.float64), axis=-1)
        np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=1e-4)

    def test_filtfilt_fft_interior_matches_scipy(self, rng):
        b, a = sps.butter(4, [0.05, 0.45], btype="bandpass")
        x = _sig(rng, 2, 20000)
        ours = np.asarray(iir.filtfilt(b, a, x))
        ref = sps.filtfilt(b, a, x.astype(np.float64), axis=-1)
        # frequency-domain zero-phase: edge transients differ from SciPy's
        # odd-padding recursion, the interior matches
        np.testing.assert_allclose(
            ours[:, 300:-300], ref[:, 300:-300], rtol=5e-3, atol=5e-4
        )

    def test_near_dc_band_gains(self):
        # a 1 Hz band edge at 1 kHz defeats f32 recursive filtering; the
        # |H|^2 frequency-domain path must keep the passband at unit gain
        # and crush the stopbands
        fs = 1000.0
        t = np.arange(20000) / fs
        x = (
            np.sin(2 * np.pi * 0.1 * t)
            + np.sin(2 * np.pi * 20.0 * t)
            + np.sin(2 * np.pi * 300.0 * t)
        ).astype(np.float32)[None]
        y = np.asarray(
            iir.butter_filter(x, (1.0, 100.0), fs=fs, order=4)
        )
        mid = slice(6000, -6000)

        def tone_amp(sig, f):
            ph = np.exp(-2j * np.pi * f * t[mid])
            return 2 * np.abs((sig[0, mid] * ph).mean())

        assert tone_amp(y, 20.0) == pytest.approx(1.0, abs=0.01)
        assert tone_amp(y, 0.1) < 0.05
        assert tone_amp(y, 300.0) < 0.01


class TestFIR:
    def test_causal_fir_matches_lfilter(self, rng):
        taps = sps.firwin(91, [0.2, 0.3], pass_zero=False)
        x = _sig(rng, 3, 1000)
        ours = np.asarray(fir.fir_causal(taps.astype(np.float32), x))
        ref = sps.lfilter(taps, 1.0, x.astype(np.float64), axis=-1)
        np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=1e-5)

    def test_bandpass_bank_matches_reference_loop(self, rng):
        x = _sig(rng, 2, 800)
        fs, order, centers = 400.0, 90, [80.0, 110.0]
        ours = np.asarray(fir.fir_bandpass_filter(x, fs, order, centers))
        ref = np.zeros_like(x, dtype=np.float64)
        for c in centers:
            t = sps.firwin(order + 1, [c * 0.9 / 200.0, c * 1.1 / 200.0],
                           pass_zero=False, fs=fs)
            ref += sps.lfilter(t, 1.0, x.astype(np.float64), axis=-1)
        ref /= len(centers)
        np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=1e-5)


class TestRereference:
    def test_car(self, rng):
        x = _sig(rng, 6, 500)
        ours = np.asarray(rereference.car_rereference(x, exclude_channels=[1, 4]))
        mask = np.ones(6, bool)
        mask[[1, 4]] = False
        ref = x - x[mask].mean(axis=0, keepdims=True)
        np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)

    def test_car_invalid_channel(self, rng):
        with pytest.raises(ValueError):
            rereference.car_rereference(_sig(rng, 4, 100), exclude_channels=[9])

    def test_interval_zscore(self, rng):
        x = _sig(rng, 4, 1000)
        ours = np.asarray(rereference.interval_zscore(x, 0, 250))
        mu = x[:, :250].mean(axis=1, keepdims=True)
        sd = x[:, :250].std(axis=1, keepdims=True)
        np.testing.assert_allclose(ours, (x - mu) / sd, rtol=1e-4, atol=1e-4)

    def test_channel_zscore(self, rng):
        x = _sig(rng, 4, 1000)
        ours = np.asarray(rereference.channel_zscore(x))
        mu = x.mean(axis=1, keepdims=True)
        sd = x.std(axis=1, keepdims=True)
        np.testing.assert_allclose(ours, (x - mu) / sd, rtol=1e-4, atol=1e-4)

    def test_rolling_zscore_matches_pandas(self, rng):
        x = _sig(rng, 3, 700)
        w = 50
        ours = np.asarray(rereference.rolling_zscore(x, w))
        df = pd.DataFrame(x.T.astype(np.float64))
        roll = df.rolling(window=w, min_periods=1)
        ref = ((df - roll.mean()) / roll.std()).T.to_numpy()
        # first column is NaN in both (single-sample window, ddof=1 std)
        assert np.isnan(ours[:, 0]).all() and np.isnan(ref[:, 0]).all()
        np.testing.assert_allclose(ours[:, 1:], ref[:, 1:], rtol=2e-3, atol=2e-3)

    def test_rolling_zscore_fill_nans(self, rng):
        x = _sig(rng, 2, 100)
        ours = np.asarray(rereference.rolling_zscore(x, 10, fill_nans=True))
        assert np.isfinite(ours).all()


class TestBlockedOps:
    """Blockwise (overlap-discard) variants for long recordings must match
    the full-length transforms in the interior."""

    def test_blocked_hilbert_matches_full(self, rng):
        sr = 400.0
        x = rng.standard_normal((2, 20000)).astype(np.float32)
        full = np.asarray(hilbert.hilbert_filter(x, sr, [(70.0, 150.0)]))
        blocked = np.asarray(
            hilbert.hilbert_filter_blocked(
                x, sr, [(70.0, 150.0)], chunk=4096, overlap=512
            )
        )
        assert blocked.shape == full.shape
        # interior parity: the blocked version zero-pads chunk edges while
        # the full FFT wraps circularly; away from the edges they agree
        interior_full = full[:, 1000:-1000]
        interior_blocked = blocked[:, 1000:-1000]
        np.testing.assert_allclose(
            interior_blocked, interior_full, rtol=2e-2, atol=2e-3
        )
