"""Jitted JAX/Pallas numeric ops — the compute heart of the framework.

Each module provides pure functions (jit-compatible, statically shaped)
that replace the reference's NumPy/SciPy loops with batched, fused,
TPU-friendly computation. Oracle tests in ``tests/test_ops_*.py`` pin the
numerics against SciPy / pandas on synthetic signals.
"""

from . import anova, fir, framing, hilbert, iir, rereference, resample, runlength  # noqa: F401
