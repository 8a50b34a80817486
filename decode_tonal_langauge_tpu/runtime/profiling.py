"""Profiling / timing hooks.

The reference has no tracing (SURVEY.md §5); here every stage can be
wrapped in a ``jax.profiler`` trace context and hot calls timed with
``block_until_ready`` fencing.
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: Optional[str] = None):
    """Profiler trace context; no-op when ``log_dir`` is None."""
    if log_dir is None:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def _fence(tree):
    """Force completion of every array in ``tree``.

    ``block_until_ready`` can return before execution finishes on tunneled
    backends, so fence with an actual host readback of (one element of)
    each device array.
    """
    for leaf in jax.tree_util.tree_leaves(tree):
        if hasattr(leaf, "addressable_shards"):
            jax.device_get(leaf.ravel()[:1] if hasattr(leaf, "ravel") else leaf)


def timed(fn: Callable, *args, warmup: int = 1, repeats: int = 5, **kwargs):
    """(result, seconds-per-call) with device-completion fencing."""
    result = None
    for _ in range(max(warmup, 0)):
        result = fn(*args, **kwargs)
    _fence(result)

    t0 = time.perf_counter()
    for _ in range(repeats):
        result = fn(*args, **kwargs)
    _fence(result)
    per_call = (time.perf_counter() - t0) / repeats
    return result, per_call


class StageTimer:
    """Accumulates named wall-clock spans; printable summary."""

    def __init__(self):
        self.spans = {}

    @contextlib.contextmanager
    def span(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.spans[name] = self.spans.get(name, 0.0) + time.perf_counter() - t0

    def summary(self) -> str:
        total = sum(self.spans.values()) or 1.0
        lines = [
            f"{name}: {secs:.3f}s ({100 * secs / total:.1f}%)"
            for name, secs in sorted(self.spans.items(), key=lambda kv: -kv[1])
        ]
        return "\n".join(lines)
