"""Headline benchmark: raw-ECoG preprocessing throughput vs the CPU reference.

Measures the reference pipeline's compute hot path (SURVEY.md §3.2) —
FFT downsample 3052 Hz -> 400 Hz, Gaussian Hilbert filter-bank high-gamma
(70-150 Hz) envelope, interval z-score — on a synthetic 128-channel
recording, comparing:

- CPU floor: a faithful NumPy/SciPy re-implementation of the reference's
  per-bank x per-channel loop (``frequency_filter.py:170-181``), timed on
  this host, vs
- TPU path: this framework's fused jitted chain on the attached chip.

Prints ONE JSON line: value = recording-seconds of ECoG preprocessed per
wall-second on the TPU path; ``vs_baseline`` = speedup over the CPU floor
(target >= 50x per BASELINE.md).
"""

from __future__ import annotations

import json
import math
import time

import numpy as np
import scipy.signal


def cpu_reference_chain(data: np.ndarray, raw_sr: float, target_sr: float):
    """Reference-equivalent NumPy/SciPy implementation (loop included)."""
    from decode_tonal_langauge_tpu.ops.hilbert import (
        bank_kernels,
        gaussian_bank_params,
    )

    n_out = int(data.shape[1] * (target_sr / raw_sr))
    ds = scipy.signal.resample(data, n_out, axis=1)

    centers, sigmas = gaussian_bank_params([(70.0, 150.0)])
    kernels = bank_kernels(ds.shape[1], target_sr, centers, sigmas)

    data_fft = np.fft.fft(ds, axis=1)
    c, t = ds.shape
    out = np.zeros((c, t, len(centers)))
    for i in range(len(centers)):  # the reference's double loop
        k = kernels[i]
        for ch in range(c):
            out[ch, :, i] = np.abs(np.fft.ifft(data_fft[ch] * k))
    env = out.mean(axis=2)

    mu = env[:, : int(25 * target_sr)].mean(axis=1, keepdims=True)
    sd = env[:, : int(25 * target_sr)].std(axis=1, keepdims=True)
    return (env - mu) / sd


def tpu_chain_builder(raw_t: int, raw_sr: float, target_sr: float):
    import jax
    import jax.numpy as jnp

    from decode_tonal_langauge_tpu.ops.hilbert import (
        bank_kernels,
        gaussian_bank_params,
    )
    from decode_tonal_langauge_tpu.ops.resample import fft_resample

    n_out = int(raw_t * (target_sr / raw_sr))
    centers, sigmas = gaussian_bank_params([(70.0, 150.0)])
    kernels = jnp.asarray(
        bank_kernels(n_out, target_sr, centers, sigmas), dtype=jnp.float32
    )
    zs_end = int(25 * target_sr)

    @jax.jit
    def chain(x):
        ds = fft_resample(x, n_out)
        X = jnp.fft.fft(ds, axis=-1)

        def body(acc, kernel):
            return acc + jnp.abs(jnp.fft.ifft(X * kernel[None, :], axis=-1)), None

        acc0 = jnp.zeros(ds.shape, dtype=jnp.float32)
        acc, _ = jax.lax.scan(body, acc0, kernels)
        env = acc / kernels.shape[0]

        ref = env[:, :zs_end]
        mu = ref.mean(axis=1, keepdims=True)
        sd = ref.std(axis=1, keepdims=True)
        return (env - mu) / sd

    return chain


def main():
    import jax

    raw_sr, target_sr = 3052.0, 400.0
    n_channels, duration_s = 128, 60.0
    raw_t = int(raw_sr * duration_s)

    rng = np.random.default_rng(0)
    data = rng.standard_normal((n_channels, raw_t)).astype(np.float32)

    # ---- CPU reference floor (single run; it is slow) ----
    t0 = time.perf_counter()
    cpu_out = cpu_reference_chain(data, raw_sr, target_sr)
    cpu_time = time.perf_counter() - t0

    # ---- TPU path ----
    chain = tpu_chain_builder(raw_t, raw_sr, target_sr)
    x_dev = jax.device_put(data)
    out = chain(x_dev)
    jax.block_until_ready(out)  # compile + warmup

    n_runs = 5
    t0 = time.perf_counter()
    for _ in range(n_runs):
        out = chain(x_dev)
    jax.block_until_ready(out)
    tpu_time = (time.perf_counter() - t0) / n_runs

    # numerics sanity: TPU output matches the CPU reference chain
    corr = float(
        np.corrcoef(np.asarray(out).ravel(), cpu_out.ravel())[0, 1]
    )
    if not math.isfinite(corr) or corr < 0.99:
        raise SystemExit(f"numeric mismatch vs CPU reference: corr={corr}")

    throughput = duration_s / tpu_time  # recording-seconds per wall-second
    speedup = cpu_time / tpu_time

    print(
        json.dumps(
            {
                "metric": "ecog_preprocess_recording_seconds_per_second",
                "value": round(throughput, 2),
                "unit": "rec_s/s (128ch raw 3052Hz -> 400Hz high-gamma envelope)",
                "vs_baseline": round(speedup, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
