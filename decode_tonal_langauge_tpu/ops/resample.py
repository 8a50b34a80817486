"""FFT-domain resampling with ``scipy.signal.resample`` numerics.

Replaces the reference downsample step's host-side SciPy call
(``/root/reference/preprocess/signal/downsample.py:6-29``) with a jitted
rFFT -> spectrum-truncate/pad -> irFFT pipeline batched over channels.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("num",))
def fft_resample(x: jax.Array, num: int) -> jax.Array:
    """Resample real ``x`` to ``num`` points along the last axis.

    Matches ``scipy.signal.resample`` for real input: copy the shared
    positive-frequency bins, handle the Nyquist bin split/join, inverse
    transform at the new length and rescale by ``num / Nx``.
    """
    nx = x.shape[-1]
    if num == nx:
        return x

    X = jnp.fft.rfft(x, axis=-1)

    n_shared = min(num, nx)
    nyq = n_shared // 2 + 1

    out_bins = num // 2 + 1
    Y = jnp.zeros(x.shape[:-1] + (out_bins,), dtype=X.dtype)
    Y = Y.at[..., :nyq].set(X[..., :nyq])

    if n_shared % 2 == 0:
        if num < nx:
            # Downsampling: fold the energy of the (now highest) Nyquist bin.
            Y = Y.at[..., n_shared // 2].multiply(2.0)
        elif num > nx:
            # Upsampling: the old Nyquist bin splits into two half-bins.
            Y = Y.at[..., n_shared // 2].multiply(0.5)

    y = jnp.fft.irfft(Y, n=num, axis=-1)
    return (y * (float(num) / float(nx))).astype(x.dtype)


def resample_to_rate(x: jax.Array, orig_sr: float, target_sr: float) -> jax.Array:
    """Resample so the sampling rate becomes ``target_sr``.

    Uses the reference's sample-count rule ``int(T * target / orig)``
    (``downsample.py:24-26``).
    """
    num = int(x.shape[-1] * (target_sr / orig_sr))
    return fft_resample(x, num)
