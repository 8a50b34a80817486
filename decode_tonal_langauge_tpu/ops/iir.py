"""IIR (Butterworth) filtering in JAX with SciPy-parity semantics.

Filter *design* (Butterworth coefficients, steady-state initial conditions)
is a host-side, static-config computation and uses SciPy. Filter
*application* is jitted JAX with two regimes:

- short signals: a transposed-direct-form-II recurrence as a ``lax.scan``
  over time with all channels batched in the state (exact SciPy order of
  operations);
- recording-length signals (> ``IIR_SCAN_LIMIT``): a timestep-sequential
  scan at 183 k samples costs hundreds of ms on TPU, so
  - *causal* filtering uses a **block-state decomposition**: the
    recurrence ``s[t] = A s[t-1] + B x[t]`` splits into length-``L``
    blocks — in-block zero-state response as a Toeplitz matmul (MXU,
    fully parallel), cross-block state propagation as a short scan over
    precomputed ``A^L`` / ``A^{L-1-k}B`` matrices, homogeneous output
    term as one matmul; ~100x faster at float-tolerance parity;
  - *zero-phase* filtering multiplies by the exact ``|H(f)|^2`` in the
    frequency domain (pow-2 padded rFFT): no recursion at all, so it
    stays accurate in f32 even for near-DC bands (pole radius
    ``1 - 1e-4``) that defeat any single-precision recursive form.

Parity targets:
- ``lfilter(b, a, x)`` == ``scipy.signal.lfilter``
- ``filtfilt(b, a, x)`` == ``scipy.signal.filtfilt`` (default method="pad",
  padtype="odd", padlen=3*max(len(a),len(b)), Gustafsson-free), the
  zero-phase path used by the reference (``frequency_filter.py:226-227``)
- ``sosfilt(sos, x)`` == ``scipy.signal.sosfilt``, the causal path
  (``frequency_filter.py:223-224``)
"""

from __future__ import annotations

from functools import lru_cache, partial
from typing import Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np
import scipy.signal as sps

# Above this many samples, lfilter/sosfilt/filtfilt switch from the exact
# timestep scan to the block-state decomposition (a 183 k-step lax.scan
# costs ~300 ms on TPU; the blocked form ~3 ms).
IIR_SCAN_LIMIT = 8192
_IIR_BLOCK = 256


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


# ---------------------------------------------------------------------------
# Block-state decomposition (long signals)
# ---------------------------------------------------------------------------

def _ba_state_space(b: np.ndarray, a: np.ndarray):
    """DF2T state-space (A, B, b0) of a normalised (b, a) filter.

    State s (n-1 dims) follows ``s[t] = A s[t-1] + B x[t]`` with output
    ``y[t] = s[t-1][0] + b[0] x[t]`` — exactly the recurrence of
    :func:`_lfilter_scan`, so SciPy's ``lfilter_zi`` states apply directly.
    """
    n = max(len(b), len(a))
    b = np.pad(np.asarray(b, dtype=np.float64), (0, n - len(b)))
    a = np.pad(np.asarray(a, dtype=np.float64), (0, n - len(a)))
    b, a = b / a[0], a / a[0]

    m = n - 1
    A = np.zeros((m, m))
    A[:, 0] = -a[1:]
    A[:-1, 1:] = np.eye(m - 1)
    B = b[1:] - a[1:] * b[0]
    return A, B, float(b[0])


def _block_iir_tables(b, a, block: int):
    """Cached wrapper: the table build loops ``block`` small matmuls and
    recurs per call (e.g. per recording block of a session)."""
    return _block_iir_tables_cached(
        tuple(np.asarray(b, np.float64).tolist()),
        tuple(np.asarray(a, np.float64).tolist()),
        block,
    )



@lru_cache(maxsize=64)
def _block_iir_tables_cached(b, a, block: int):
    """Host-side (float64) precompute for the block-state form.

    Returns (T, M, K, P):
      T (block, block)  lower-triangular Toeplitz of the truncated impulse
                        response: the in-block zero-state response is the
                        matmul ``x_block @ T^T`` (a conv would be the same
                        math but compiles pathologically on some backends)
      M (block, m)      M[i] = C A^i        (homogeneous output term)
      K (m, block)      K[:, k] = A^{block-1-k} B   (state input term)
      P (m, m)          A^block              (state propagation)
    """
    A, B, b0 = _ba_state_space(b, a)
    m = A.shape[0]
    C = np.zeros(m)
    C[0] = 1.0

    h = np.zeros(block)
    M = np.zeros((block, m))
    K = np.zeros((m, block))
    h[0] = b0
    Apow = np.eye(m)  # A^i
    for i in range(block):
        M[i] = C @ Apow
        K[:, block - 1 - i] = Apow @ B  # A^i B lands at k = block-1-i
        if i + 1 < block:
            h[i + 1] = C @ Apow @ B
        Apow = Apow @ A
    P = Apow  # A^block

    import scipy.linalg

    T = scipy.linalg.toeplitz(h, np.zeros(block))
    return T, M, K, P


@partial(jax.jit, static_argnames=("block",))
def _lfilter_blocked_core(T, M, K, P, x, s0, block: int):
    """Blocked application. ``x``: (..., T) with T % block == 0;
    ``s0``: (..., m) incoming state. Returns (y, s_final)."""
    lead = x.shape[:-1]
    nb = x.shape[-1] // block
    xb = x.reshape((-1, nb, block))  # (R, nb, L)
    r = xb.shape[0]

    hp = jax.lax.Precision.HIGHEST

    # 1) In-block zero-state response: Toeplitz matmul with the truncated
    #    impulse response, every block in parallel (MXU).
    y_zs = jnp.einsum("rjl,kl->rjk", xb, T.astype(x.dtype), precision=hp)

    # 2) Per-block state input contributions, all in parallel: u_j = K @ x_j.
    u = jnp.einsum("ml,rjl->rjm", K.astype(x.dtype), xb, precision=hp)

    # 3) Short sequential scan over blocks: s_j = P s_{j-1} + u_j.
    def prop(s, u_j):
        s_next = s @ P.T.astype(x.dtype) + u_j
        return s_next, s

    s_last, s_in = jax.lax.scan(
        prop, s0.reshape((r, -1)), jnp.moveaxis(u, 1, 0)
    )  # s_in: (nb, R, m) = state entering each block

    # 4) Homogeneous output term: one matmul.
    y_hom = jnp.einsum(
        "lm,jrm->rjl", M.astype(x.dtype), s_in, precision=hp
    )

    y = (y_zs + y_hom).reshape(lead + (nb * block,))
    return y, s_last.reshape(lead + (P.shape[0],))


def lfilter_blocked(
    b, a, x: jax.Array, zi: Optional[jax.Array] = None, block: int = _IIR_BLOCK
):
    """``scipy.signal.lfilter`` semantics over the last axis via the
    block-state decomposition (float-tolerance parity with the scan)."""
    t = x.shape[-1]
    T, M, K, P = _block_iir_tables(b, a, block)
    m = P.shape[0]

    return_zf = zi is not None
    if zi is None:
        s0 = jnp.zeros(x.shape[:-1] + (m,), dtype=x.dtype)
    else:
        s0 = jnp.broadcast_to(
            jnp.asarray(zi, dtype=x.dtype), x.shape[:-1] + (m,)
        )

    t_full = (t // block) * block
    y, zf = _lfilter_blocked_core(
        jnp.asarray(T, dtype=x.dtype),
        jnp.asarray(M, dtype=x.dtype),
        jnp.asarray(K, dtype=x.dtype),
        jnp.asarray(P, dtype=x.dtype),
        x[..., :t_full], s0, block,
    )
    if t_full < t:
        # Remainder tail (< one block): the exact timestep scan, seeded
        # with the blocked pass's final state.
        n = max(len(b), len(a))
        bj = jnp.pad(jnp.asarray(b, dtype=x.dtype), (0, n - len(b)))
        aj = jnp.pad(jnp.asarray(a, dtype=x.dtype), (0, n - len(a)))
        bj, aj = bj / aj[0], aj / aj[0]
        y_tail, zf = _lfilter_scan(bj, aj, x[..., t_full:], zf)
        y = jnp.concatenate([y, y_tail], axis=-1)
    if return_zf:
        return y, zf
    return y


def lfilter(
    b,
    a,
    x: jax.Array,
    zi: Optional[jax.Array] = None,
    axis: int = -1,
):
    """SciPy-compatible ``lfilter``. Returns y (and zf when zi given).

    Long signals route to the block-state decomposition automatically:
    directly for filters up to biquad order, via a tf2sos biquad cascade
    above that (high-order companion matrices are too ill-conditioned for
    f32 block tables — their transient ``A^i`` growth overflows; biquads
    are well-behaved).
    """
    x_moved = jnp.moveaxis(x, axis, -1)
    order = max(len(np.atleast_1d(b)), len(np.atleast_1d(a))) - 1
    if x_moved.shape[-1] > IIR_SCAN_LIMIT and (order <= 2 or zi is None):
        if order <= 2:
            result = lfilter_blocked(
                np.asarray(b), np.asarray(a), x_moved, zi=zi
            )
            if zi is not None:
                y, zf = result
                return jnp.moveaxis(y, -1, axis), zf
            return jnp.moveaxis(result, -1, axis)
        # High order, zero initial state: biquad cascade.
        sos_np = sps.tf2sos(np.asarray(b, np.float64), np.asarray(a, np.float64))
        y = x_moved
        for section in sos_np:
            y = lfilter_blocked(section[:3], section[3:], y)
        return jnp.moveaxis(y, -1, axis)
    if x_moved.shape[-1] > IIR_SCAN_LIMIT:
        # order > 2 with zi: a tf-form initial state has no per-biquad
        # decomposition, so the blocked cascade cannot honor it. On TPU
        # the exact recurrence runs as a Pallas kernel (state in VMEM,
        # ~60 ns/step — ~30x the lax.scan); elsewhere fall back to the
        # timestep scan with a loud warning.
        if (
            jax.default_backend() == "tpu"
            and jnp.result_type(x_moved.dtype) == jnp.float32
        ):
            # (f32 only: the kernel computes in f32; f64 inputs under
            # jax_enable_x64 keep the dtype-preserving scan below.)
            from .pallas_iir import lfilter_pallas

            y, zf = lfilter_pallas(b, a, x_moved, zi=zi)
            return jnp.moveaxis(y, -1, axis), zf
        import warnings

        warnings.warn(
            f"lfilter: order-{order} filter with zi on a "
            f"{x_moved.shape[-1]}-sample signal runs the sequential "
            "timestep scan (no blocked path exists for tf-form initial "
            "state above biquad order, and the Pallas kernel needs a "
            "TPU); expect ~2 us/sample. Split the filter into SOS "
            "sections with per-section zi, or pass zi=None to use the "
            "blocked biquad cascade.",
            stacklevel=2,
        )

    return_zf = zi is not None
    y, zf = _lfilter_scan_path(b, a, x_moved, zi)
    y = jnp.moveaxis(y, -1, axis)
    if return_zf:
        return y, zf
    return y


def _lfilter_scan_path(b, a, x: jax.Array, zi):
    """Normalize/pad coefficients and run the exact timestep scan over
    the last axis (the short-signal path; also used directly by
    ``filtfilt``, whose internal odd extension must not re-enter
    ``lfilter``'s long-signal dispatch)."""
    b = jnp.asarray(b, dtype=jnp.result_type(jnp.asarray(b).dtype, x.dtype))
    a = jnp.asarray(a, dtype=b.dtype)
    b = b / a[0]
    a = a / a[0]

    n = max(b.shape[0], a.shape[0])
    b = jnp.pad(b, (0, n - b.shape[0]))
    a = jnp.pad(a, (0, n - a.shape[0]))

    if zi is None:
        zi_arr = jnp.zeros(x.shape[:-1] + (n - 1,), dtype=x.dtype)
    else:
        zi_arr = jnp.broadcast_to(
            jnp.asarray(zi, dtype=x.dtype), x.shape[:-1] + (n - 1,)
        )

    return _lfilter_scan(b, a, x, zi_arr)


def filtfilt(b, a, x: jax.Array, axis: int = -1) -> jax.Array:
    """Zero-phase forward-backward filtering, SciPy default semantics.

    Odd-extension padding of length ``3*max(len(a), len(b))`` and
    steady-state initial conditions scaled by the first padded sample.
    Long signals run as a blocked biquad cascade (sosfiltfilt-equivalent
    numerics; parity to float tolerance).
    """
    b_np = np.atleast_1d(np.asarray(b, dtype=np.float64))
    a_np = np.atleast_1d(np.asarray(a, dtype=np.float64))
    padlen = 3 * max(len(a_np), len(b_np))

    x = jnp.moveaxis(x, axis, -1)
    if x.shape[-1] <= padlen:
        raise ValueError(
            f"The length of the input vector x must be greater than padlen={padlen}."
        )

    if x.shape[-1] > IIR_SCAN_LIMIT:
        y = sos_filtfilt_fft(sps.tf2sos(b_np, a_np), x)
        return jnp.moveaxis(y, -1, axis)

    # Odd extension at both edges.
    left = 2 * x[..., :1] - x[..., 1 : padlen + 1][..., ::-1]
    right = 2 * x[..., -1:] - x[..., -padlen - 1 : -1][..., ::-1]
    ext = jnp.concatenate([left, x, right], axis=-1)

    zi = lfilter_zi(b_np, a_np)  # host-side, static
    zi_j = jnp.asarray(zi, dtype=x.dtype)
    # Direct scan path: the odd extension can push a just-under-limit
    # signal over IIR_SCAN_LIMIT, which must not re-enter lfilter's
    # long-signal dispatch (wrong warning / different kernel).
    y, _ = _lfilter_scan_path(b_np, a_np, ext, zi_j * ext[..., :1])
    y = y[..., ::-1]
    y, _ = _lfilter_scan_path(b_np, a_np, y, zi_j * y[..., :1])
    y = y[..., ::-1]

    y = y[..., padlen:-padlen]
    return jnp.moveaxis(y, -1, axis)


def _next_pow2(n: int) -> int:
    return 1 << (int(n) - 1).bit_length()


@partial(jax.jit, static_argnames=("nfft", "padlen", "t"))
def _zero_phase_fft_core(x_ext, h2, nfft: int, padlen: int, t: int):
    X = jnp.fft.rfft(x_ext, n=nfft, axis=-1)  # zero-pads to nfft (pow2)
    y = jnp.fft.irfft(X * h2, n=nfft, axis=-1)
    return y[..., padlen : padlen + t].astype(x_ext.dtype)


def sos_filtfilt_fft(sos_np: np.ndarray, x: jax.Array) -> jax.Array:
    """Zero-phase SOS filtering via the exact squared magnitude response.

    ``filtfilt`` IS multiplication by |H(f)|^2 in the frequency domain;
    applying it there has no recursion at all, so it stays accurate in
    f32 even for near-DC Butterworth bands whose recursive forms need
    f64 (pole radius 1 - 1e-4: any f32 state recursion loses the signal).
    |H|^2 is evaluated host-side in f64 at the padded FFT bins; the
    pow-2 zero padding (>= 25% of the signal) absorbs the circular-conv
    wrap of the impulse-response tails. Edges use the same odd extension
    as SciPy's ``sosfiltfilt`` default.
    """
    t = x.shape[-1]
    padlen = min(3 * (2 * len(sos_np) + 1), t - 1)
    left = 2 * x[..., :1] - x[..., 1 : padlen + 1][..., ::-1]
    right = 2 * x[..., -1:] - x[..., -padlen - 1 : -1][..., ::-1]
    ext = jnp.concatenate([left, x, right], axis=-1)

    t_ext = ext.shape[-1]
    # The zero padding must outlast the impulse-response tail or the
    # circular convolution wraps it into the output. A fixed floor is
    # wrong for signals just above IIR_SCAN_LIMIT with near-DC bands
    # (pole radius 1-1e-4 decays over ~10^5 samples): scale the floor to
    # the dominant pole's 60 dB decay length, capped to keep the FFT
    # allocatable for pathological pole radii.
    _, poles, _ = sps.sos2zpk(sos_np)
    r_max = float(np.max(np.abs(poles))) if len(poles) else 0.0
    if 0.0 < r_max < 1.0:
        n_decay = int(np.log(1e-3) / np.log(r_max)) + 1
    else:
        n_decay = 4096
    n_decay = min(n_decay, 1 << 22)
    nfft = _next_pow2(t_ext + max(t_ext // 4, n_decay, 4096))

    w = 2.0 * np.pi * np.fft.rfftfreq(nfft)  # rad/sample
    _, h = sps.sosfreqz(sos_np, worN=w)
    h2 = jnp.asarray((h * np.conj(h)).real, dtype=jnp.float32)

    return _zero_phase_fft_core(ext, h2, nfft, padlen, t)


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
    """Causal second-order-section filtering (zero initial conditions).

    Long signals apply each biquad via the block-state decomposition.
    """
    x = jnp.moveaxis(x, axis, -1)
    if x.shape[-1] > IIR_SCAN_LIMIT:
        sos_np = np.asarray(sos, dtype=np.float64)
        y = x
        for section in sos_np:
            y = lfilter_blocked(section[:3], section[3:], y)
        return jnp.moveaxis(y, -1, axis)
    sos_j = jnp.asarray(sos, dtype=x.dtype)
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
    ``sosfilt`` (cf. ``frequency_filter.py:218-229``). Long recordings
    run zero-phase through an SOS design directly: extreme bands (e.g. a
    0.3 Hz edge at kHz rates) make the order-2N ``(b, a)`` polynomial so
    ill-conditioned that its factored sections come out unstable, while
    sections designed from the analog prototype are exact.
    """
    if causal:
        sos = butter_design(order, freqs, fs, filter_type, output="sos")
        return sosfilt(sos, data)
    if data.shape[-1] > IIR_SCAN_LIMIT:
        sos = butter_design(order, freqs, fs, filter_type, output="sos")
        return sos_filtfilt_fft(sos, data)
    b, a = butter_design(order, freqs, fs, filter_type, output="ba")
    return filtfilt(b, a, data)
