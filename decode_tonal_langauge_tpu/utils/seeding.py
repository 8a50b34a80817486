"""Seeding utility mirroring the reference's ``utils/utils.py:set_seeds``.

The reference seeds NumPy + torch globally (``/root/reference/utils/
utils.py:6-20``). JAX has no global RNG — randomness flows through
explicit keys — so the TPU-native counterpart seeds NumPy (whose global
stream the pipeline's reference-compatible seed draws use, see
``training/train_classifier.py``) and hands back a root ``jax.random``
key for everything on device.
"""

from __future__ import annotations

import numpy as np


def set_seeds(seed: int):
    """Seed NumPy's global stream and return a root JAX PRNG key.

    Matches the reference contract (reproducible seed draws via
    ``np.random``) while making the device-side stream explicit:

        key = set_seeds(42)
        k_init, k_dropout = jax.random.split(key)
    """
    import jax

    np.random.seed(seed)
    return jax.random.key(seed)


def seed_stream(seed: int = 42, repeat: int = 1) -> np.ndarray:
    """The reference's per-repeat seed draw, without global side effects.

    The reference draws ``np.random.seed(seed); np.random.randint(0,
    10000, repeat)`` (``/root/reference/train_classifier.py:92-93``),
    reseeding the process-global stream as a side effect. A local
    ``RandomState`` reproduces the identical legacy stream — training,
    evaluation, and serving all derive the same seeds — while leaving
    callers' global randomness alone.
    """
    return np.random.RandomState(seed).randint(0, 10000, repeat)
