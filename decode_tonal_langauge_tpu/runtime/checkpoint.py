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
