"""Classifier factory: dotted-path class resolution with signature-filtered
superset kwargs.

One config field drives any architecture: the factory offers
``{n_classes, n_channels, seq_length, input_channels, input_length,
input_dim}`` plus user kwargs and keeps only what the model class accepts
— the reference's mechanism (``/root/reference/models/classifier_factory.py:10-58``),
adapted to Flax dataclass fields.
"""

from __future__ import annotations

import dataclasses
import importlib
from typing import Any, Dict, Optional

from flax import linen as nn

from ..registry import canonical_module_path


def resolve_model_class(model_path: str):
    """Import the model class from a dotted path (with reference aliasing)."""
    path = canonical_module_path(model_path)
    module_name, class_name = path.rsplit(".", 1)
    module = importlib.import_module(module_name)
    return getattr(module, class_name)


def get_classifier_by_name(
    model_path: str,
    n_classes: int,
    n_channels: int,
    seq_length: int,
    classifier_kwargs: Optional[Dict[str, Any]] = None,
) -> nn.Module:
    """Build a classifier Module with signature-filtered kwargs."""
    cls = resolve_model_class(model_path)

    base_kwargs: Dict[str, Any] = {
        "n_classes": n_classes,
        "n_channels": n_channels,
        "seq_length": seq_length,
        "input_channels": n_channels,
        "input_length": seq_length,
        "input_dim": n_channels * seq_length,
    }
    if classifier_kwargs:
        base_kwargs.update(classifier_kwargs)

    allowed = {f.name for f in dataclasses.fields(cls)}
    kwargs = {k: v for k, v in base_kwargs.items() if k in allowed}
    if isinstance(kwargs.get("dtype"), str):
        # YAML configs name compute dtypes as strings: {dtype: bfloat16}
        import jax.numpy as jnp

        kwargs["dtype"] = jnp.dtype(kwargs["dtype"])
    return cls(**kwargs)
