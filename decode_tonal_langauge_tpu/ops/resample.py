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


def fft_resample_blocked(
    x: jax.Array,
    num: int,
    chunk_in: int = 32768,
    overlap_in: int = 4096,
) -> jax.Array:
    """Overlap-discard blockwise FFT resampling for long signals.

    TPU FFTs of arbitrary huge lengths are impractical (Bluestein blowup /
    compiler limits), so the signal is resampled in fixed-size chunks with
    discarded boundary context. Sinc interpolation is effectively local, so
    interior samples match the full-length FFT resample to float tolerance;
    the first/last ``overlap`` samples inherit the chunk's edge behaviour.

    ``num / x.shape[-1]`` must keep ``chunk_in`` and ``overlap_in`` mapping
    to integer output counts (choose chunk sizes as multiples of the
    rational rate's denominator).
    """
    n_in = x.shape[-1]
    if num == n_in:
        return x
    ratio = num / n_in
    chunk_out = chunk_in * ratio
    overlap_out = overlap_in * ratio
    if abs(chunk_out - round(chunk_out)) > 1e-9 or abs(
        overlap_out - round(overlap_out)
    ) > 1e-9:
        raise ValueError(
            "chunk_in/overlap_in must map to integer output lengths for "
            f"ratio {num}/{n_in}."
        )
    chunk_out, overlap_out = int(round(chunk_out)), int(round(overlap_out))

    if n_in <= chunk_in:
        return fft_resample(x, num)

    step_in = chunk_in - 2 * overlap_in
    step_out = chunk_out - 2 * overlap_out
    n_steps = -(-n_in // step_in)

    # Pad so every chunk (with context) is in range.
    pad_total = overlap_in + (n_steps * step_in + overlap_in + chunk_in) - n_in
    xp = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(overlap_in, pad_total)])

    starts = jnp.arange(n_steps) * step_in

    def one(start):
        seg = jax.lax.dynamic_slice_in_dim(xp, start, chunk_in, axis=-1)
        out = fft_resample(seg, chunk_out)
        return jax.lax.slice_in_dim(out, overlap_out, chunk_out - overlap_out, axis=-1)

    pieces = jax.lax.map(one, starts)  # (n_steps, ..., step_out)
    out = jnp.moveaxis(pieces, 0, -2).reshape(x.shape[:-1] + (n_steps * step_out,))
    return out[..., :num]
