"""Benchmark classifiers: logistic regression and shallow MLP.

Flax counterparts of ``/root/reference/models/simple_classifiers.py``.
Both flatten any (B, ...) input, validate the flat feature size, and
return logits of shape (B, n_classes).
"""

from __future__ import annotations

from typing import Optional

import jax
from flax import linen as nn

from .base import get_activation


class LogisticRegressionClassifier(nn.Module):
    """Flatten -> single Dense layer (``simple_classifiers.py:9-60``)."""

    input_dim: int
    n_classes: int

    def setup(self):
        if self.n_classes < 2:
            raise ValueError("Number of classes must be at least 2.")
        self.linear = nn.Dense(self.n_classes)

    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        if x.ndim > 2:
            x = x.reshape((x.shape[0], -1))
        if x.shape[1] != self.input_dim:
            raise ValueError(
                f"Expected input dimension {self.input_dim}, got {x.shape[1]}."
            )
        return self.linear(x)


class ShallowNNClassifier(nn.Module):
    """Flatten -> Dense(hidden) -> activation -> Dense
    (``simple_classifiers.py:63-134``); hidden defaults to input_dim // 2."""

    input_dim: int
    n_classes: int
    hidden_dim: Optional[int] = None
    activation: str = "ReLU"

    def setup(self):
        if self.n_classes < 2:
            raise ValueError("Number of classes must be at least 2.")
        hidden = self.hidden_dim if self.hidden_dim is not None else self.input_dim // 2
        self.hidden = nn.Dense(hidden)
        self.output = nn.Dense(self.n_classes)
        self._act = get_activation(self.activation)

    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        if x.ndim > 2:
            x = x.reshape((x.shape[0], -1))
        if x.shape[1] != self.input_dim:
            raise ValueError(
                f"Expected input dimension {self.input_dim}, got {x.shape[1]}."
            )
        return self.output(self._act(self.hidden(x)))
