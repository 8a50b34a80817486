"""Model base utilities: activation registry, param introspection, shape math.

Capability parity with ``/root/reference/models/classifier.py`` (param-count
introspection per top-level layer) and ``/root/reference/models/utils.py``
(activation-name dispatch, decay/no-decay parameter split — the latter lives
in ``training/optim.py`` as an Optax mask).
"""

from __future__ import annotations

from typing import Callable, Dict

import jax
import jax.numpy as jnp
from flax import linen as nn


def get_activation(name: str, **kwargs) -> Callable[[jax.Array], jax.Array]:
    """Activation function by name (ELU/ReLU/LeakyReLU/PReLU/GLU/GELU)."""
    table = {
        "ELU": lambda x: nn.elu(x, **kwargs),
        "ReLU": lambda x: nn.relu(x),
        "LeakyReLU": lambda x: nn.leaky_relu(
            x, negative_slope=kwargs.get("negative_slope", 0.01)
        ),
        "PReLU": lambda x: nn.leaky_relu(
            x, negative_slope=kwargs.get("negative_slope", 0.25)
        ),
        "GLU": lambda x: nn.glu(x, **kwargs),
        "GELU": lambda x: nn.gelu(x),
    }
    if name not in table:
        raise ValueError(f"Unsupported activation function: {name}")
    return table[name]


def count_params(params) -> int:
    """Total number of parameters in a pytree."""
    return int(
        sum(jnp.size(leaf) for leaf in jax.tree_util.tree_leaves(params))
    )


def layer_param_counts(params) -> Dict[str, int]:
    """Parameter count per top-level module (reference's
    ``get_layer_nparams``; ``classifier.py:49-68``)."""
    tree = params.get("params", params)
    return {name: count_params(sub) for name, sub in tree.items()}


def conv_output_length(
    length: int, kernel: int, stride: int = 1, padding: int = 0
) -> int:
    """Torch-style conv/pool output-length formula (floor division)."""
    return (length + 2 * padding - kernel) // stride + 1
