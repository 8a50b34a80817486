"""Audio codec: waveform <-> Mel spectrogram (+ Griffin-Lim inverse).

Capability parity with ``/root/reference/utils/audio.py`` (which wraps
librosa): ``audio_to_mel`` returns the flattened dB mel spectrogram with
``power_to_db(ref=max)``; ``mel_to_audio`` inverts with
``db_to_power(ref=1e-4)`` (the reference's deliberately asymmetric ref,
``audio.py:41,79``) -> NNLS mel inversion -> Griffin-Lim. All the DSP runs
jitted on device; librosa itself is not required.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from ..ops.griffinlim import griffinlim, mel_to_stft_mag
from ..ops.stft import db_to_power, mel_filterbank, power_to_db, stft_magsq


def melspectrogram(
    audio: np.ndarray,
    sr: float,
    n_fft: int = 2048,
    hop_length: int = 512,
    n_mels: int = 128,
    fmin: float = 0.0,
    fmax: Optional[float] = None,
    power: float = 2.0,
) -> np.ndarray:
    """Mel power spectrogram (n_mels, n_frames), librosa conventions."""
    S = stft_magsq(np.asarray(audio, dtype=np.float32), n_fft, hop_length)
    if power != 2.0:
        S = S ** (power / 2.0)
    basis = mel_filterbank(sr, n_fft, n_mels, fmin, fmax).astype(np.float32)
    return np.asarray(basis @ np.asarray(S))


def audio_to_mel(
    audio: np.ndarray,
    audio_sampling_rate: float,
    mel_in_db: bool = True,
    mel_kwargs: Optional[dict] = None,
) -> np.ndarray:
    """Audio (n_samples,) -> flattened mel vector (n_mels * n_frames,)."""
    if np.ndim(audio) > 1:
        raise ValueError("Audio input must be a 1D array.")
    mel_kwargs = mel_kwargs or {}
    mel = melspectrogram(audio, audio_sampling_rate, **mel_kwargs)
    if mel_in_db:
        mel = np.asarray(power_to_db(mel, ref=None))
    return mel.reshape(-1)


def mel_to_audio(
    mel: np.ndarray,
    n_mels: int,
    audio_sampling_rate: float = 24414,
    mel_in_db: bool = True,
    n_fft: int = 2048,
    hop_length: int = 512,
    fmin: float = 0.0,
    fmax: Optional[float] = None,
    power: float = 2.0,
    n_iter: int = 32,
    length: Optional[int] = None,
) -> np.ndarray:
    """Flattened mel vector -> waveform via NNLS inversion + Griffin-Lim."""
    mel = np.asarray(mel, dtype=np.float32).reshape(n_mels, -1)
    if mel_in_db:
        mel = np.asarray(db_to_power(mel, ref=0.0001))

    basis = mel_filterbank(
        audio_sampling_rate, n_fft, n_mels, fmin, fmax
    ).astype(np.float32)
    S_mag = mel_to_stft_mag(mel, basis, power=power)
    wave = griffinlim(
        S_mag, n_fft=n_fft, hop_length=hop_length, n_iter=n_iter, length=length
    )
    return np.asarray(wave)


from functools import partial as _partial

import jax as _jax


@_partial(
    _jax.jit,
    static_argnames=(
        "mel_in_db", "power", "n_fft", "hop_length", "n_iter", "length",
    ),
)
def _invert_mels_batch(
    mels, basis, *, mel_in_db, power, n_fft, hop_length, n_iter, length
):
    """(B, n_mels, n_frames) -> (B, n_samples): the whole NNLS +
    Griffin-Lim chain vmapped over trials, ONE dispatch."""

    def one(mel):
        if mel_in_db:
            mel = db_to_power(mel, ref=0.0001)
        S_mag = mel_to_stft_mag(mel, basis, power=power)
        return griffinlim(
            S_mag, n_fft=n_fft, hop_length=hop_length, n_iter=n_iter,
            length=length,
        )

    return _jax.vmap(one)(mels)


def mels_to_audio(
    mels: np.ndarray,
    n_mels: int,
    audio_sampling_rate: float = 24414,
    mel_in_db: bool = True,
    n_fft: int = 2048,
    hop_length: int = 512,
    fmin: float = 0.0,
    fmax: Optional[float] = None,
    power: float = 2.0,
    n_iter: int = 32,
    length: Optional[int] = None,
) -> np.ndarray:
    """Batched :func:`mel_to_audio`: (B, n_mels * n_frames) flattened mel
    vectors -> (B, n_samples) waveforms.

    The per-trial inverse dispatches an independent NNLS solve +
    32-iteration Griffin-Lim chain per waveform (as the reference's
    librosa loop, ``/root/reference/train_synthesizer.py:402-445``); here
    the trial axis is vmapped so N waveforms cost ONE device dispatch —
    the batched FFTs/matmuls fill the chip. Bitwise identical to calling
    :func:`mel_to_audio` per trial (same seed-0 init phase; oracle-tested
    in ``tests/test_audio.py``)."""
    mels = np.asarray(mels, dtype=np.float32)
    if mels.ndim != 2:
        raise ValueError(
            f"mels_to_audio expects (batch, n_mels * n_frames); got "
            f"shape {mels.shape}"
        )
    mels = mels.reshape(mels.shape[0], n_mels, -1)
    basis = mel_filterbank(
        audio_sampling_rate, n_fft, n_mels, fmin, fmax
    ).astype(np.float32)
    waves = _invert_mels_batch(
        mels, basis, mel_in_db=mel_in_db, power=power, n_fft=n_fft,
        hop_length=hop_length, n_iter=n_iter, length=length,
    )
    return np.asarray(waves)


def visualise_mel(
    mel: np.ndarray,
    audio_sampling_rate: float = 24414,
    mel_in_db: bool = True,
    file_path: Optional[str] = None,
    show: bool = True,
    ax=None,
) -> None:
    """Heatmap of a (n_mels, n_frames) mel spectrogram."""
    import matplotlib.pyplot as plt

    own_figure = ax is None
    if own_figure:
        fig, ax = plt.subplots(figsize=(10, 4))
    im = ax.imshow(mel, aspect="auto", origin="lower", cmap="coolwarm")
    ax.set_xlabel("Frame")
    ax.set_ylabel("Mel bin")
    plt.colorbar(im, ax=ax, format="%+2.0f dB" if mel_in_db else "%+2.0f")

    if own_figure:
        ax.set_title("Mel Spectrogram")
        fig.tight_layout()
        if file_path:
            fig.savefig(file_path, dpi=150)
            plt.close(fig)
        elif show:  # pragma: no cover
            plt.show()


def compare_mels(
    mel1: np.ndarray,
    mel2: np.ndarray,
    audio_sampling_rate: float = 24414,
    title1: str = "Mel Spectrogram 1",
    title2: str = "Mel Spectrogram 2",
    mel_in_db: bool = True,
    file_path: Optional[str] = None,
) -> None:
    """Side-by-side mel comparison figure (origin vs reconstruction)."""
    import matplotlib.pyplot as plt

    fig, axes = plt.subplots(1, 2, figsize=(15, 6))
    for ax, mel, title in ((axes[0], mel1, title1), (axes[1], mel2, title2)):
        visualise_mel(mel, audio_sampling_rate, mel_in_db, ax=ax, show=False)
        ax.set_title(title)
    fig.tight_layout()
    if file_path:
        fig.savefig(file_path, dpi=150)
        plt.close(fig)
    else:  # pragma: no cover
        plt.show()


def write_wav(path: str, wave: np.ndarray, sr: int) -> None:
    """16-bit PCM WAV writer (scipy backend)."""
    from scipy.io.wavfile import write as write_wave

    wave = np.asarray(wave, dtype=np.float32)
    peak = np.max(np.abs(wave)) or 1.0
    write_wave(path, int(sr), (wave / peak * 32767).astype(np.int16))
