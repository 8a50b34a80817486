"""Speech-synthesis models: ECoG + label dynamics -> Mel spectrogram.

Flax counterparts of ``/root/reference/models/synthesis_models.py``:
``SynthesisModelCNN`` (the paper's model, a.k.a. "SynthesisFull") and the
lightweight ``SynthesisLite``. Both take non-discriminative ECoG channels
(B, C, T) and label-dynamics sequences (B, 2, n_dynamics), returning a
flattened mel-spectrogram vector (B, output_dim). NHWC layout on the conv
paths; kernel/width structure and latent-length arithmetic preserved.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.lstm import TimeBatchedLSTM
from ..ops.stencil import StencilConvPoolLeaky
from .base import conv_output_length


def synthesis_cnn_latent_length(n_timepoints: int) -> int:
    """Temporal length after the SynthesisModelCNN ECoG conv stack
    (3 valid k=3 convs + pools, then two k=1 convs with one pool;
    ``synthesis_models.py:178-198``)."""
    t = n_timepoints
    for _ in range(3):
        t = conv_output_length(t, 3)
        t = conv_output_length(t, 2, stride=2)
    t = conv_output_length(t, 1)
    t = conv_output_length(t, 2, stride=2)
    t = conv_output_length(t, 1)
    return t


class SynthesisModelCNN(nn.Module):
    """Paper synthesis model (``synthesis_models.py:49-198``).

    ECoG branch: 5 conv(+pool) blocks 512/512/512/256/conv_channels over
    time. Label branch: LSTM(2 -> latent_len * C * lstm_channels), last
    state reshaped onto the ECoG latent grid. Concatenate on features,
    4x 1x1 conv(128) + 1x1 conv(conv_channels), flatten, Dense(output_dim).
    """

    output_dim: int
    n_channels: int
    n_timepoints: int = 200
    lstm_channels: int = 6
    conv_channels: int = 64
    dropout: float = 0.5
    negative_slope: float = 0.01
    # Compute dtype (params stay f32). The train step is HBM-bound on the
    # label LSTM's recurrent weights (latent_len*C*lstm_channels wide, read
    # once per dynamics step), so bfloat16 roughly halves the step time.
    # Configs select it via model_kwargs: {dtype: bfloat16}.
    dtype: Any = jnp.float32

    def setup(self):
        self.latent_len = synthesis_cnn_latent_length(self.n_timepoints)
        if self.latent_len <= 0:
            raise ValueError(
                "n_timepoints too small for the SynthesisModelCNN conv stack."
            )
        self.ecog_convs = [
            # Block 0 has ONE input channel: the conv is K broadcast
            # outer products, fused with its pool + activation into one
            # elementwise kernel (ops/stencil.py; same param tree as the
            # nn.Conv it replaces, ~5 ms/step faster f32).
            StencilConvPoolLeaky(
                512, kernel_size=3, pool=2,
                negative_slope=self.negative_slope, dtype=self.dtype,
            ),
            nn.Conv(512, kernel_size=(3, 1), padding="VALID", dtype=self.dtype),
            nn.Conv(512, kernel_size=(3, 1), padding="VALID", dtype=self.dtype),
            nn.Conv(256, kernel_size=(1, 1), padding="VALID", dtype=self.dtype),
            nn.Conv(self.conv_channels, kernel_size=(1, 1), padding="VALID", dtype=self.dtype),
        ]
        self.ecog_dropout = nn.Dropout(self.dropout)
        lstm_size = self.latent_len * self.n_channels * self.lstm_channels
        self.label_lstm = TimeBatchedLSTM(lstm_size, dtype=self.dtype)
        self.concat_convs = [
            nn.Conv(128, kernel_size=(1, 1), dtype=self.dtype) for _ in range(4)
        ] + [nn.Conv(self.conv_channels, kernel_size=(1, 1), dtype=self.dtype)]
        self.output_layer = nn.Dense(self.output_dim, dtype=self.dtype)

    def __call__(
        self, inputs_ecog: jax.Array, inputs_labels: jax.Array, train: bool = False
    ) -> jax.Array:
        b = inputs_ecog.shape[0]

        # (B, C, T) -> (B, T, C): block 0 is the fused stencil (conv +
        # pool + leaky in one elementwise kernel — the ~0.5 GB pre-pool
        # conv activation never reaches HBM). Later blocks keep the
        # pool-BEFORE-leaky order: bitwise identical (max commutes with
        # the strictly increasing activation) at half the activation
        # traffic (PROFILE.md).
        x = self.ecog_convs[0](jnp.transpose(inputs_ecog, (0, 2, 1)))
        for i, conv in enumerate(self.ecog_convs[1:], start=1):
            x = conv(x)
            if i != 4:  # the final conv block has no pool
                x = nn.max_pool(x, window_shape=(2, 1), strides=(2, 1))
            x = nn.leaky_relu(x, negative_slope=self.negative_slope)
        x = self.ecog_dropout(x, deterministic=not train)
        # (B, latent_len, n_channels, conv_channels)

        # Labels: (B, 2, n_dynamics) -> (B, n_dynamics, 2) -> LSTM last state
        x2 = jnp.transpose(inputs_labels, (0, 2, 1)).astype(self.dtype)
        x2 = self.label_lstm(x2)[:, -1, :]
        x2 = x2.reshape((b, self.latent_len, self.n_channels, self.lstm_channels))

        y = jnp.concatenate([x, x2], axis=-1)
        for conv in self.concat_convs:
            y = conv(y)
            y = nn.leaky_relu(y, negative_slope=0.1)

        return self.output_layer(y.reshape((b, -1))).astype(jnp.float32)


class SynthesisLite(nn.Module):
    """Lightweight synthesis model (``synthesis_models.py:201-296``).

    ECoG: 2x [Conv1d + BatchNorm + LeakyReLU + MaxPool(2)]; labels:
    LSTM(label_dim -> lstm_hidden) final hidden state; concat -> Dropout ->
    Dense(512) -> Dense(output_dim).
    """

    output_dim: int
    n_channels: int
    n_timepoints: int = 200
    label_dim: int = 2
    conv_channels: int = 32
    lstm_hidden: int = 64
    dropout: float = 0.3
    negative_slope: float = 0.01
    dtype: Any = jnp.float32

    def setup(self):
        self.conv1 = nn.Conv(self.conv_channels, kernel_size=(5,), padding=2, dtype=self.dtype)
        self.bn1 = nn.BatchNorm(dtype=self.dtype)
        self.conv2 = nn.Conv(self.conv_channels, kernel_size=(3,), padding=1, dtype=self.dtype)
        self.bn2 = nn.BatchNorm(dtype=self.dtype)
        self.label_lstm = TimeBatchedLSTM(self.lstm_hidden, dtype=self.dtype)
        self.drop = nn.Dropout(self.dropout)
        self.fc1 = nn.Dense(512, dtype=self.dtype)
        self.fc2 = nn.Dense(self.output_dim, dtype=self.dtype)

    def __call__(
        self, x_ecog: jax.Array, x_label: jax.Array, train: bool = False
    ) -> jax.Array:
        # (B, C, T) -> (B, T, C)
        x = jnp.transpose(x_ecog, (0, 2, 1)).astype(self.dtype)
        # max_pool before leaky_relu: bitwise identical (monotone
        # activation commutes with max) and halves the activation
        # traffic through the nonlinearity; BN stays pre-pool.
        x = self.conv1(x)
        x = self.bn1(x, use_running_average=not train)
        x = nn.max_pool(x, window_shape=(2,), strides=(2,))
        x = nn.leaky_relu(x, negative_slope=self.negative_slope)
        x = self.conv2(x)
        x = self.bn2(x, use_running_average=not train)
        x = nn.max_pool(x, window_shape=(2,), strides=(2,))
        x = nn.leaky_relu(x, negative_slope=self.negative_slope)
        x = x.reshape((x.shape[0], -1))  # (B, (T//4) * conv_channels)

        lbl = jnp.transpose(x_label, (0, 2, 1)).astype(self.dtype)  # (B, L, 2)
        lbl = self.label_lstm(lbl)[:, -1, :]

        y = jnp.concatenate([x, lbl], axis=-1)
        y = self.drop(y, deterministic=not train)
        y = nn.leaky_relu(self.fc1(y), negative_slope=self.negative_slope)
        return self.fc2(y).astype(jnp.float32)
