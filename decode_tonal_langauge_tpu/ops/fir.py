"""FIR filtering as batched causal convolution.

Design (``firwin``) is host-side SciPy; application is a single
``lax.conv_general_dilated`` over all channels — fully parallel, unlike the
reference's per-center-frequency ``lfilter`` loop
(``/root/reference/preprocess/signal/frequency_filter.py:261-272``).
"""

from __future__ import annotations

from typing import List

import jax
import jax.numpy as jnp
import numpy as np
import scipy.signal as sps


def firwin_bandpass(order: int, lowcut: float, highcut: float, fs: float) -> np.ndarray:
    """FIR bandpass taps, reference parameterisation (``firwin(order+1, ...)``)."""
    nyq = 0.5 * fs
    return sps.firwin(order + 1, [lowcut / nyq, highcut / nyq], pass_zero=False, fs=fs)


@jax.jit
def fir_causal(taps: jax.Array, x: jax.Array) -> jax.Array:
    """Causal FIR filtering of (..., T) — equals ``scipy.signal.lfilter(taps, 1, x)``.

    Implemented as left-padded correlation with the flipped kernel so the
    whole batch maps to one convolution.
    """
    k = taps.shape[0]
    batch_shape = x.shape[:-1]
    t = x.shape[-1]
    xb = x.reshape((-1, 1, t))  # (N, 1, T) NCW
    kern = taps[::-1].reshape((1, 1, k)).astype(x.dtype)  # (O, I, K)
    y = jax.lax.conv_general_dilated(
        xb,
        kern,
        window_strides=(1,),
        padding=[(k - 1, 0)],
        dimension_numbers=("NCH", "OIH", "NCH"),
        precision=jax.lax.Precision.HIGHEST,
    )
    return y.reshape(batch_shape + (t,))


def fir_bandpass_filter(
    data: jax.Array,
    fs: float,
    order: int,
    center_frequencies: List[float],
) -> jax.Array:
    """Mean of causal FIR bandpasses at +/-10% around each center frequency.

    Matches the reference's accumulate-then-divide semantics
    (``frequency_filter.py:258-274``).
    """
    acc = jnp.zeros_like(data)
    for center in center_frequencies:
        taps = firwin_bandpass(order, center * 0.9, center * 1.1, fs)
        acc = acc + fir_causal(jnp.asarray(taps, dtype=data.dtype), data)
    return acc / len(center_frequencies)
