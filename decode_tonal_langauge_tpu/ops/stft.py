"""STFT / iSTFT and mel filterbank with librosa-compatible conventions.

librosa is not available in this environment, so the conventions it uses
are reimplemented and pinned by tests against hand-derived NumPy oracles:

- STFT: hann (periodic) window, ``center=True`` zero padding, frame count
  ``1 + (len(padded) - n_fft) // hop``.
- Mel filterbank: Slaney-style mel scale (linear below 1 kHz,
  logarithmic above) with ``norm='slaney'`` area normalisation — the
  defaults of ``librosa.filters.mel``.
- ``power_to_db(ref=max, amin=1e-10, top_db=80)`` and
  ``db_to_power(ref)`` exactly as used by the reference audio codec
  (``/root/reference/utils/audio.py:41,79``).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def hann_window(n: int) -> np.ndarray:
    """Periodic Hann window (``fftbins=True``)."""
    return 0.5 * (1.0 - np.cos(2.0 * np.pi * np.arange(n) / n))


def hz_to_mel(f: np.ndarray) -> np.ndarray:
    """Slaney mel scale (htk=False)."""
    f = np.asarray(f, dtype=np.float64)
    f_sp = 200.0 / 3
    mels = f / f_sp
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    safe = np.maximum(f, 1e-10)
    return np.where(
        f >= min_log_hz, min_log_mel + np.log(safe / min_log_hz) / logstep, mels
    )


def mel_to_hz(m: np.ndarray) -> np.ndarray:
    m = np.asarray(m, dtype=np.float64)
    f_sp = 200.0 / 3
    freqs = m * f_sp
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    return np.where(
        m >= min_log_mel, min_log_hz * np.exp(logstep * (m - min_log_mel)), freqs
    )


def mel_filterbank(
    sr: float,
    n_fft: int,
    n_mels: int = 128,
    fmin: float = 0.0,
    fmax: Optional[float] = None,
) -> np.ndarray:
    """Slaney-normalised triangular mel filterbank (n_mels, 1 + n_fft//2)."""
    if fmax is None:
        fmax = sr / 2.0

    fft_freqs = np.linspace(0, sr / 2.0, 1 + n_fft // 2)
    mel_pts = np.linspace(hz_to_mel(fmin), hz_to_mel(fmax), n_mels + 2)
    hz_pts = mel_to_hz(mel_pts)

    fdiff = np.diff(hz_pts)
    ramps = hz_pts[:, None] - fft_freqs[None, :]

    lower = -ramps[:-2] / fdiff[:-1, None]
    upper = ramps[2:] / fdiff[1:, None]
    weights = np.maximum(0.0, np.minimum(lower, upper))

    # Slaney area normalisation
    enorm = 2.0 / (hz_pts[2 : n_mels + 2] - hz_pts[:n_mels])
    weights *= enorm[:, None]
    return weights


@partial(jax.jit, static_argnames=("n_fft", "hop_length", "center"))
def stft_magsq(
    y: jax.Array, n_fft: int = 2048, hop_length: int = 512, center: bool = True
) -> jax.Array:
    """|STFT|^2 of a 1-D signal -> (1 + n_fft//2, n_frames)."""
    X = stft(y, n_fft, hop_length, center)
    return (X.real**2 + X.imag**2).astype(jnp.float32)


@partial(jax.jit, static_argnames=("n_fft", "hop_length", "center"))
def stft(
    y: jax.Array, n_fft: int = 2048, hop_length: int = 512, center: bool = True
) -> jax.Array:
    """Complex STFT with librosa conventions -> (1 + n_fft//2, n_frames)."""
    window = jnp.asarray(hann_window(n_fft), dtype=y.dtype)
    if center:
        y = jnp.pad(y, (n_fft // 2, n_fft // 2))
    n_frames = 1 + (y.shape[0] - n_fft) // hop_length
    idx = (
        jnp.arange(n_frames)[:, None] * hop_length + jnp.arange(n_fft)[None, :]
    )
    frames = y[idx] * window[None, :]
    return jnp.fft.rfft(frames, axis=-1).T  # (freq, frames)


@partial(jax.jit, static_argnames=("n_fft", "hop_length", "length"))
def istft(
    X: jax.Array, n_fft: int = 2048, hop_length: int = 512, length: Optional[int] = None
) -> jax.Array:
    """Inverse STFT (center=True) with hann-window NOLA normalisation."""
    window = jnp.asarray(hann_window(n_fft), dtype=jnp.float32)
    frames = jnp.fft.irfft(X.T, n=n_fft, axis=-1)  # (n_frames, n_fft)
    frames = frames * window[None, :]

    n_frames = frames.shape[0]
    total = n_fft + hop_length * (n_frames - 1)
    idx = (
        jnp.arange(n_frames)[:, None] * hop_length + jnp.arange(n_fft)[None, :]
    ).reshape(-1)

    y = jnp.zeros(total, dtype=frames.dtype).at[idx].add(frames.reshape(-1))
    wsum = (
        jnp.zeros(total, dtype=frames.dtype)
        .at[idx]
        .add(jnp.tile(window**2, n_frames))
    )
    y = y / jnp.maximum(wsum, 1e-10)

    y = y[n_fft // 2 : total - n_fft // 2]
    if length is not None:
        if y.shape[0] < length:
            # The analysis dropped a partial tail frame; zero-fill it.
            y = jnp.pad(y, (0, length - y.shape[0]))
        y = y[:length]
    return y


def power_to_db(
    S: jax.Array,
    ref: Optional[float] = None,
    amin: float = 1e-10,
    top_db: Optional[float] = 80.0,
) -> jax.Array:
    """librosa ``power_to_db``; ``ref=None`` means ``ref=max(S)``."""
    S = jnp.asarray(S)
    ref_value = jnp.max(S) if ref is None else jnp.abs(ref)
    log_spec = 10.0 * jnp.log10(jnp.maximum(amin, S))
    log_spec = log_spec - 10.0 * jnp.log10(jnp.maximum(amin, ref_value))
    if top_db is not None:
        log_spec = jnp.maximum(log_spec, jnp.max(log_spec) - top_db)
    return log_spec


def db_to_power(S_db: jax.Array, ref: float = 1.0) -> jax.Array:
    return ref * jnp.power(10.0, 0.1 * jnp.asarray(S_db))
