"""IIR (Butterworth) filtering in JAX with SciPy-parity semantics.

Filter *design* (Butterworth coefficients, steady-state initial conditions)
is a host-side, static-config computation and uses SciPy. Filter
*application* is jitted JAX: a transposed-direct-form-II recurrence run as a
``lax.scan`` over time with all channels batched in the state.

Parity targets:
- ``lfilter(b, a, x)`` == ``scipy.signal.lfilter``
- ``filtfilt(b, a, x)`` == ``scipy.signal.filtfilt`` (default method="pad",
  padtype="odd", padlen=3*max(len(a),len(b)), Gustafsson-free), the
  zero-phase path used by the reference (``frequency_filter.py:226-227``)
- ``sosfilt(sos, x)`` == ``scipy.signal.sosfilt``, the causal path
  (``frequency_filter.py:223-224``)
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np
import scipy.signal as sps


# ---------------------------------------------------------------------------
# Host-side design
# ---------------------------------------------------------------------------

def butter_design(
    order: int,
    freqs: Union[float, Tuple[float, float]],
    fs: float,
    filter_type: str = "bandpass",
    output: str = "ba",
):
    """Butterworth design (host-side). ``freqs`` in Hz."""
    nyq = 0.5 * fs
    wn = np.asarray(freqs, dtype=float) / nyq
    return sps.butter(order, wn, btype=filter_type, output=output)


def lfilter_zi(b: np.ndarray, a: np.ndarray) -> np.ndarray:
    """Steady-state initial conditions (host-side, static per-filter)."""
    return sps.lfilter_zi(b, a)


# ---------------------------------------------------------------------------
# Jitted application
# ---------------------------------------------------------------------------

@jax.jit
def _lfilter_scan(
    b: jax.Array, a: jax.Array, x: jax.Array, zi: jax.Array
) -> Tuple[jax.Array, jax.Array]:
    """Transposed-direct-form-II recurrence over the last axis.

    ``x``: (..., T); ``zi``: (..., n-1) state. Normalised so a[0] == 1.
    """
    n = b.shape[0]

    def step(state, xt):
        # state: (..., n-1); xt: (...,)
        yt = b[0] * xt + state[..., 0]
        new_state = jnp.concatenate(
            [state[..., 1:], jnp.zeros_like(state[..., :1])], axis=-1
        )
        new_state = new_state + b[1:] * xt[..., None] - a[1:] * yt[..., None]
        return new_state, yt

    xT = jnp.moveaxis(x, -1, 0)  # (T, ...)
    zf, yT = jax.lax.scan(step, zi, xT)
    return jnp.moveaxis(yT, 0, -1), zf


def lfilter(
    b,
    a,
    x: jax.Array,
    zi: Optional[jax.Array] = None,
    axis: int = -1,
):
    """SciPy-compatible ``lfilter``. Returns y (and zf when zi given)."""
    b = jnp.asarray(b, dtype=jnp.result_type(jnp.asarray(b).dtype, x.dtype))
    a = jnp.asarray(a, dtype=b.dtype)
    b = b / a[0]
    a = a / a[0]
    x = jnp.moveaxis(x, axis, -1)

    n = max(b.shape[0], a.shape[0])
    b = jnp.pad(b, (0, n - b.shape[0]))
    a = jnp.pad(a, (0, n - a.shape[0]))

    return_zf = zi is not None
    if zi is None:
        zi_arr = jnp.zeros(x.shape[:-1] + (n - 1,), dtype=x.dtype)
    else:
        zi_arr = jnp.broadcast_to(
            jnp.asarray(zi, dtype=x.dtype), x.shape[:-1] + (n - 1,)
        )

    y, zf = _lfilter_scan(b, a, x, zi_arr)
    y = jnp.moveaxis(y, -1, axis)
    if return_zf:
        return y, zf
    return y


def filtfilt(b, a, x: jax.Array, axis: int = -1) -> jax.Array:
    """Zero-phase forward-backward filtering, SciPy default semantics.

    Odd-extension padding of length ``3*max(len(a), len(b))`` and
    steady-state initial conditions scaled by the first padded sample.
    """
    b_np = np.atleast_1d(np.asarray(b, dtype=np.float64))
    a_np = np.atleast_1d(np.asarray(a, dtype=np.float64))
    padlen = 3 * max(len(a_np), len(b_np))
    zi = lfilter_zi(b_np, a_np)  # host-side, static

    x = jnp.moveaxis(x, axis, -1)
    if x.shape[-1] <= padlen:
        raise ValueError(
            f"The length of the input vector x must be greater than padlen={padlen}."
        )

    # Odd extension at both edges.
    left = 2 * x[..., :1] - x[..., 1 : padlen + 1][..., ::-1]
    right = 2 * x[..., -1:] - x[..., -padlen - 1 : -1][..., ::-1]
    ext = jnp.concatenate([left, x, right], axis=-1)

    zi_j = jnp.asarray(zi, dtype=x.dtype)

    y, _ = lfilter(b_np, a_np, ext, zi=zi_j * ext[..., :1])
    y = y[..., ::-1]
    y, _ = lfilter(b_np, a_np, y, zi=zi_j * y[..., :1])
    y = y[..., ::-1]

    y = y[..., padlen:-padlen]
    return jnp.moveaxis(y, -1, axis)


@jax.jit
def _sosfilt_scan(sos: jax.Array, x: jax.Array) -> jax.Array:
    """Cascade of second-order sections, each a DF2T recurrence."""

    def apply_section(x, section):
        b = section[:3]
        a = section[3:]
        b = b / a[0]
        a = a / a[0]

        def step(state, xt):
            yt = b[0] * xt + state[..., 0]
            s0 = b[1] * xt - a[1] * yt + state[..., 1]
            s1 = b[2] * xt - a[2] * yt
            return jnp.stack([s0, s1], axis=-1), yt

        zi = jnp.zeros(x.shape[:-1] + (2,), dtype=x.dtype)
        xT = jnp.moveaxis(x, -1, 0)
        _, yT = jax.lax.scan(step, zi, xT)
        return jnp.moveaxis(yT, 0, -1), None

    y, _ = jax.lax.scan(apply_section, x, sos)
    return y


def sosfilt(sos, x: jax.Array, axis: int = -1) -> jax.Array:
    """Causal second-order-section filtering (zero initial conditions)."""
    sos_j = jnp.asarray(sos, dtype=x.dtype)
    x = jnp.moveaxis(x, axis, -1)
    y = _sosfilt_scan(sos_j, x)
    return jnp.moveaxis(y, -1, axis)


def butter_filter(
    data: jax.Array,
    freqs: Union[float, Tuple[float, float]],
    fs: float,
    order: int = 4,
    causal: bool = False,
    filter_type: str = "bandpass",
) -> jax.Array:
    """Butterworth band/low/high-pass with the reference's dispatch.

    ``causal=False`` -> zero-phase ``filtfilt``; ``causal=True`` ->
    ``sosfilt`` (cf. ``frequency_filter.py:218-229``).
    """
    if causal:
        sos = butter_design(order, freqs, fs, filter_type, output="sos")
        return sosfilt(sos, data)
    b, a = butter_design(order, freqs, fs, filter_type, output="ba")
    return filtfilt(b, a, data)
