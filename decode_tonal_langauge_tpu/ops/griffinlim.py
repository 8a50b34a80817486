"""Griffin-Lim phase reconstruction and mel-spectrogram inversion on device.

Replaces ``librosa.feature.inverse.mel_to_audio`` (used by the reference
at ``/root/reference/utils/audio.py:76-87``): mel -> power spectrogram via
a jitted projected-gradient NNLS solve (librosa uses SciPy NNLS), then
Griffin-Lim with momentum as a ``lax.fori_loop`` (librosa defaults:
n_iter=32, momentum=0.99).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .stft import istft, stft


@partial(jax.jit, static_argnames=("n_iter",))
def nnls_project(A: jax.Array, B: jax.Array, n_iter: int = 100) -> jax.Array:
    """Nonnegative least squares ``min ||A X - B||`` via projected gradient.

    ``A``: (m, n); ``B``: (m, k). Accelerated (Nesterov) projected gradient
    with a Lipschitz step 1/||A^T A||_2 (power-iteration estimate).
    """
    AtA = A.T @ A
    AtB = A.T @ B

    # Power iteration for the spectral norm of AtA.
    def pow_body(_, v):
        v = AtA @ v
        return v / jnp.maximum(jnp.linalg.norm(v), 1e-12)

    v0 = jnp.ones((AtA.shape[0],), dtype=A.dtype) / jnp.sqrt(AtA.shape[0])
    v = jax.lax.fori_loop(0, 30, pow_body, v0)
    lipschitz = jnp.maximum(v @ (AtA @ v), 1e-12)
    step = 1.0 / lipschitz

    X0 = jnp.maximum(jnp.linalg.pinv(A) @ B, 0.0)

    def body(i, carry):
        X, Y, t = carry
        grad = AtA @ Y - AtB
        X_new = jnp.maximum(Y - step * grad, 0.0)
        t_new = 0.5 * (1.0 + jnp.sqrt(1.0 + 4.0 * t * t))
        Y_new = X_new + ((t - 1.0) / t_new) * (X_new - X)
        return X_new, Y_new, t_new

    X, _, _ = jax.lax.fori_loop(0, n_iter, body, (X0, X0, jnp.asarray(1.0, A.dtype)))
    return X


def mel_to_stft_mag(
    mel_spec: jax.Array, mel_basis: jax.Array, power: float = 2.0
) -> jax.Array:
    """Invert a mel power spectrogram to an STFT magnitude spectrogram."""
    S = nnls_project(mel_basis, mel_spec)
    return jnp.power(jnp.maximum(S, 0.0), 1.0 / power)


@partial(
    jax.jit,
    static_argnames=("n_fft", "hop_length", "n_iter", "length"),
)
def griffinlim(
    S_mag: jax.Array,
    n_fft: int = 2048,
    hop_length: int = 512,
    n_iter: int = 32,
    momentum: float = 0.99,
    length: int | None = None,
    seed: int = 0,
) -> jax.Array:
    """Griffin-Lim with momentum. ``S_mag``: (1 + n_fft//2, n_frames)."""
    key = jax.random.key(seed)
    phase = jax.random.uniform(
        key, S_mag.shape, minval=-jnp.pi, maxval=jnp.pi, dtype=jnp.float32
    )
    angles = jnp.exp(1j * phase).astype(jnp.complex64)
    S = S_mag.astype(jnp.complex64)

    def body(i, carry):
        angles, tprev = carry
        inverse = istft(S * angles, n_fft, hop_length, length=None)
        rebuilt = stft(inverse, n_fft, hop_length)
        new_angles = rebuilt - (momentum / (1.0 + momentum)) * tprev
        new_angles = new_angles / jnp.maximum(jnp.abs(new_angles), 1e-16)
        return new_angles, rebuilt

    angles, _ = jax.lax.fori_loop(0, n_iter, body, (angles, jnp.zeros_like(angles)))
    return istft(S * angles, n_fft, hop_length, length=length)
