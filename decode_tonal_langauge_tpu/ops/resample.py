"""On-device resampling: FFT (short signals) and polyphase FIR (long).

The capability replaced here is the reference downsample step's host-side
SciPy call (``/root/reference/preprocess/signal/downsample.py:6-29``).

Two kernels:

- :func:`fft_resample` — ``scipy.signal.resample`` numerics as a jitted
  rFFT -> spectrum-truncate/pad -> irFFT, batched over channels. Exact
  parity with the reference, but only viable for short signals on TPU:
  this backend lowers non-power-of-two FFTs into dense T x T DFT matmuls,
  so a minutes-long recording would try to allocate hundreds of GB.
- :func:`polyphase_resample` — ``scipy.signal.resample_poly`` numerics as
  a single strided ``conv_general_dilated`` whose ``up`` output phases are
  the conv's output channels. Work scales as O(C * T * taps/up) and maps
  onto the MXU; this is the production path for recording-length signals.

:func:`resample_to_rate` picks between them by length (threshold
``FFT_LENGTH_LIMIT``), keeping the reference's output-sample-count rule.
"""

from __future__ import annotations

import math
from fractions import Fraction
from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np

# Above this many input samples, resample_to_rate switches from the exact
# FFT method to the polyphase FIR method (non-pow2 FFTs become dense DFT
# matmuls on TPU: f32[T, T] scratch, i.e. ~134 GB at T=183120).
FFT_LENGTH_LIMIT = 16384


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


@lru_cache(maxsize=32)
def _polyphase_tables(up: int, down: int):
    """Cached (weights, pad_left) for a rate pair — the host-side filter
    design + phase packing costs ~ms and recurs for every block of a
    recording session."""
    h = resample_poly_filter(up, down)
    return _polyphase_conv_weights(up, down, h)


def resample_poly_filter(up: int, down: int) -> np.ndarray:
    """Anti-aliasing FIR used by ``scipy.signal.resample_poly``.

    Kaiser(5.0)-windowed sinc, cutoff at the tighter of the two Nyquist
    rates, 20*max(up, down)+1 taps, gain ``up`` (host-side design; the
    filter is static config, not data).
    """
    max_rate = max(up, down)
    half_len = 10 * max_rate
    n_taps = 2 * half_len + 1
    cutoff = 1.0 / max_rate  # in units of the upsampled Nyquist

    m = np.arange(n_taps) - half_len
    h = cutoff * np.sinc(cutoff * m)
    h *= np.kaiser(n_taps, 5.0)
    h *= up / h.sum()  # unit DC gain, then compensate the zero-stuffing
    return h.astype(np.float64)


def _polyphase_conv_weights(up: int, down: int, h: np.ndarray):
    """Pack the polyphase decomposition of ``h`` into strided-conv weights.

    Output sample ``m = q + r*up`` of ``upfirdn(h, x, up, down)`` cropped
    at the filter center (the ``resample_poly`` alignment) is

        y[m] = sum_j h[up*j + P_q] * x[r*down + B_q - j]

    with ``P_q = (q*down + D) % up``, ``B_q = (q*down + D) // up`` and
    ``D = (len(h)-1)//2``. Folding the per-phase offset ``B_q`` into the
    tap position turns all ``up`` phases into output channels of ONE conv
    with ``window_strides=down``: weight ``w[q, t]`` multiplies
    ``x[r*down + t + s0]``, so ``t = B_q - j - s0``.

    Returns ``(w, pad_left)`` where ``w`` has shape (up, 1, W) for conv
    dimension numbers ("NCH", "OIH", "NCH") and ``pad_left = -s0``.
    """
    L = len(h)
    D = (L - 1) // 2
    J = -(-L // up)  # taps per phase
    q = np.arange(up)
    P = (q * down + D) % up
    B = (q * down + D) // up
    s0 = int(B.min()) - (J - 1)
    W = int(B.max()) - s0 + 1

    w = np.zeros((up, 1, W), dtype=np.float64)
    j = np.arange(J)
    for qi in range(up):
        t = B[qi] - j - s0  # position of tap j of phase qi
        k = up * j + P[qi]  # index into h
        valid = (k >= 0) & (k < L)
        w[qi, 0, t[valid]] = h[k[valid]]
    return w, -s0


@partial(jax.jit, static_argnames=("up", "down", "n_out", "pad_left"))
def _polyphase_apply(
    x: jax.Array, w: jax.Array, up: int, down: int, n_out: int, pad_left: int
) -> jax.Array:
    """Strided conv + phase interleave. ``x``: (C, T) -> (C, n_out)."""
    n_blocks = -(-n_out // up)  # output positions per phase
    t_in = x.shape[-1]
    w_len = w.shape[-1]
    # rightmost input index touched: (n_blocks-1)*down + w_len-1 - pad_left
    need = (n_blocks - 1) * down + w_len - pad_left
    pad_right = max(0, need - t_in)

    out = jax.lax.conv_general_dilated(
        x[:, None, :].astype(jnp.float32),
        w.astype(jnp.float32),
        window_strides=(down,),
        padding=[(pad_left, pad_right)],
        dimension_numbers=("NCH", "OIH", "NCH"),
        # default conv precision is bf16-grade on both this backend and the
        # CPU simulator (~1e-3 error); the anti-alias FIR needs full f32
        precision=jax.lax.Precision.HIGHEST,
    )  # (C, up, n_blocks)
    y = jnp.swapaxes(out, 1, 2).reshape(x.shape[0], n_blocks * up)
    return y[:, :n_out].astype(x.dtype)


# Above this many polyphase phases, the conv formulation's weight tensor
# (up x W) and its output transpose blow past VMEM; the gather form's
# footprint is independent of `up`.
_CONV_PHASE_LIMIT = 256


@lru_cache(maxsize=32)
def _phase_tap_table(up: int, down: int):
    """(Hphase (up, J), D): per-phase tap table for the gather form.

    ``y[m] = sum_j Hphase[(m*down + D) % up, j] * x[(m*down + D)//up - j]``
    """
    h = resample_poly_filter(up, down)
    L = len(h)
    D = (L - 1) // 2
    J = -(-L // up)
    Hphase = np.zeros((up, J))
    for q in range(up):
        k = up * np.arange(J) + q
        valid = k < L
        Hphase[q, valid] = h[k[valid]]
    return Hphase, D


@partial(jax.jit, static_argnames=("up", "down", "n_out"))
def _polyphase_apply_gather(
    x: jax.Array, Hphase: jax.Array, D: jax.Array, up: int, down: int, n_out: int
) -> jax.Array:
    """Gather formulation: windows of J input samples per output, taps
    selected by output phase. (C, T) -> (C, n_out)."""
    J = Hphase.shape[1]
    m = jnp.arange(n_out)
    pos = m * down + D
    b = pos // up
    p = pos % up

    idx = b[:, None] - jnp.arange(J)[None, :]  # (n_out, J)
    valid = (idx >= 0) & (idx < x.shape[-1])
    idxc = jnp.clip(idx, 0, x.shape[-1] - 1)
    xw = x[..., idxc]  # (C, n_out, J)
    taps = jnp.where(valid, Hphase[p], 0.0).astype(x.dtype)  # zero padding
    return jnp.einsum(
        "cmj,mj->cm", xw, taps, precision=jax.lax.Precision.HIGHEST
    ).astype(x.dtype)


def polyphase_resample(x: jax.Array, up: int, down: int) -> jax.Array:
    """``scipy.signal.resample_poly(x, up, down, axis=-1)`` on device.

    ``x`` is (..., T) real; leading axes are flattened into the batch.
    Small phase counts use the strided-conv form (MXU); large ones (odd
    rational rates, e.g. TDT's 3051.7578125 Hz) the gather form.
    """
    g = math.gcd(up, down)
    up, down = up // g, down // g
    if up == 1 and down == 1:
        return x

    n_out = -(-x.shape[-1] * up // down)
    x = jnp.asarray(x)
    lead = x.shape[:-1]
    flat = x.reshape((-1, x.shape[-1]))

    if up <= _CONV_PHASE_LIMIT:
        w, pad_left = _polyphase_tables(up, down)
        y = _polyphase_apply(flat, jnp.asarray(w), up, down, n_out, pad_left)
    else:
        Hphase, D = _phase_tap_table(up, down)
        y = _polyphase_apply_gather(
            flat, jnp.asarray(Hphase, dtype=jnp.float32), D, up, down, n_out
        )
    return y.reshape(lead + (n_out,))


def resample_to_rate(
    x: jax.Array,
    orig_sr: float,
    target_sr: float,
    method: str = "auto",
) -> jax.Array:
    """Resample so the sampling rate becomes ``target_sr``.

    Keeps the reference's sample-count rule ``int(T * target / orig)``
    (``downsample.py:24-26``). ``method``: ``"fft"`` (exact
    ``scipy.signal.resample`` numerics), ``"poly"`` (polyphase FIR), or
    ``"auto"`` — FFT for short signals, polyphase beyond
    ``FFT_LENGTH_LIMIT`` where non-pow2 FFTs cannot compile on TPU.
    """
    t_in = x.shape[-1]
    num = int(t_in * (target_sr / orig_sr))
    if method == "auto":
        method = "fft" if t_in <= FFT_LENGTH_LIMIT else "poly"
    if method == "fft":
        return fft_resample(x, num)
    if method != "poly":
        raise ValueError(f"method must be fft/poly/auto, got {method!r}")

    frac = Fraction(target_sr) / Fraction(orig_sr)
    frac = frac.limit_denominator(10_000)
    up, down = frac.numerator, frac.denominator
    # Reconcile the ceil-based polyphase length with the reference's
    # int() rule by padding the INPUT (edge mode) until the polyphase
    # yields >= num samples — the tail is then computed from real signal
    # instead of appended as literal zeros.
    t_need = -(-num * down // up)
    if t_need > t_in:
        x = jnp.pad(
            x, [(0, 0)] * (x.ndim - 1) + [(0, t_need - t_in)], mode="edge"
        )
    y = polyphase_resample(x, up, down)
    return y[..., :num]
