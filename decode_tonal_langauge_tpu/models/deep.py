"""Paper deep classifiers: temporal CNN (syllable) and CNN-RNN (tone).

Flax counterparts of ``/root/reference/models/deep_classifiers.py`` — the
architectures of Liu et al., Sci. Adv. 2023. Layout is TPU-native NHWC
(time = H, electrodes = W, features = C) instead of the reference's NCHW;
kernel/width/stride structure, latent-length arithmetic, and the sigmoid
output head are preserved.

Known reference quirk *not* replicated: ``CNNRNNClassifier.forward`` uses
``x.view(B, t', -1)`` on an NCHW tensor (``deep_classifiers.py:309``),
which scrambles channel/time ordering before the second LSTM; here the
reshape keeps (time, width*features) semantics.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.lstm import TimeBatchedLSTM
from ..ops.stencil import StencilConvPoolLeaky
from .base import conv_output_length


def cnn_latent_length(input_length: int) -> int:
    """Temporal length after the CNNClassifier feature extractor
    (6 valid convs k=3 with pools k=2 after blocks 1-4 and 6;
    ``deep_classifiers.py:121-155``)."""
    t = input_length
    for _ in range(4):
        t = conv_output_length(t, 3)
        t = conv_output_length(t, 2, stride=2)
    t = conv_output_length(t, 3)  # block 5: conv only
    t = conv_output_length(t, 3)
    t = conv_output_length(t, 2, stride=2)
    return t


class CNNClassifier(nn.Module):
    """Temporal CNN for syllable decoding (``deep_classifiers.py:17-155``).

    Input (B, C, T) -> image (B, T, C, 1) -> 6 conv blocks (512...256
    features, kernel (3,1) over time) -> Dense(1024) -> Dense(n_classes)
    -> sigmoid.
    """

    input_channels: int
    input_length: int
    n_classes: int
    dropout_rate: float = 0.5
    negative_slope: float = 0.01
    # Compute dtype for the conv/dense stack (params stay f32). bfloat16
    # is MXU-native: measured 1.45x faster per train step at identical
    # loss curves on v5e. Configs select it via model_kwargs: {dtype: bfloat16}.
    dtype: Any = jnp.float32

    def setup(self):
        if self.n_classes < 2:
            raise ValueError("Number of classes must be at least 2.")
        if self.input_channels <= 0:
            raise ValueError("Input channels must be a positive integer.")
        self.latent_length = cnn_latent_length(self.input_length)
        if self.latent_length <= 0:
            raise ValueError(
                "Input length is too small for the convolutional layers. "
                "Please increase the input length or adjust the model architecture."
            )

        widths = [512, 512, 512, 512, 512, 256]
        self.convs = [
            # Block 0 sees ONE input channel — fused stencil conv + pool
            # + leaky (ops/stencil.py), same param tree as the nn.Conv it
            # replaces, skips the ~0.4 GB pre-pool HBM round trip.
            StencilConvPoolLeaky(
                widths[0], kernel_size=3, pool=2,
                negative_slope=self.negative_slope, dtype=self.dtype,
            )
        ] + [
            nn.Conv(w, kernel_size=(3, 1), padding="VALID", dtype=self.dtype)
            for w in widths[1:]
        ]
        self.dropout = nn.Dropout(self.dropout_rate)
        self.fc1 = nn.Dense(1024, dtype=self.dtype)
        # The class head always computes in f32 (flax promotes the bf16
        # activations against the f32 params): a bf16 head quantizes the
        # logits to bf16's ~2^-8 grid and the sigmoid then produces EXACT
        # top-2 ties (measured: 9/20 test trials on a trained model),
        # making argmax flip between differently-compiled forwards — the
        # training stage and the evaluation stage would disagree on the
        # same checkpoint. The head is ~4k params; f32 here is free.
        self.fc2 = nn.Dense(self.n_classes)

    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        # (B, C, T) -> (B, T, C): block 0 is the fused stencil; later
        # blocks pool BEFORE the leaky-relu — bitwise identical (max
        # commutes with the strictly increasing activation) at half the
        # activation traffic (PROFILE.md).
        x = self.convs[0](jnp.transpose(x, (0, 2, 1)))
        for i, conv in enumerate(self.convs[1:], start=1):
            x = conv(x)
            if i != 4:  # block 5 has no pool
                x = nn.max_pool(x, window_shape=(2, 1), strides=(2, 1))
            x = nn.leaky_relu(x, negative_slope=self.negative_slope)
        x = self.dropout(x, deterministic=not train)

        x = x.reshape((x.shape[0], -1))
        x = nn.leaky_relu(self.fc1(x), negative_slope=self.negative_slope)
        return nn.sigmoid(self.fc2(x.astype(jnp.float32)))


class CNNRNNClassifier(nn.Module):
    """CNN-RNN for tone decoding (``deep_classifiers.py:158-343``).

    Parallel branches — LSTM(C -> lstm_dim) last state reshaped into an
    image, and the raw (T, C) image — each through a Conv(1024, k=(7,1)) +
    pool block, concatenated on the electrode/width axis, processed by a
    1024 -> 512 -> 256 conv stack, then a second LSTM(-> 512) whose last
    state feeds the sigmoid head. Requires lstm_dim % input_length == 0.
    """

    input_channels: int
    input_length: int
    n_classes: int
    lstm_dim: int = 800
    dropout: float = 0.5
    negative_slope: float = 0.01
    dtype: Any = jnp.float32

    def setup(self):
        if self.n_classes < 2:
            raise ValueError("Number of classes must be at least 2.")
        if self.lstm_dim % self.input_length != 0:
            raise ValueError(
                f"lstm_dim ({self.lstm_dim}) must be divisible "
                f"by input_length ({self.input_length})."
            )
        self.lstm1 = TimeBatchedLSTM(self.lstm_dim, dtype=self.dtype)
        # Both branch-opening convs see ONE input channel and are the
        # model's largest intermediates ((B, 194, C, 1024) is ~0.8 GB
        # f32 pre-pool at batch 32) — fused stencil conv + pool + leaky
        # (ops/stencil.py), same param tree as the nn.Conv versions.
        self.conv1 = StencilConvPoolLeaky(
            1024, kernel_size=7, pool=2,
            negative_slope=self.negative_slope, dtype=self.dtype,
        )
        self.conv2 = StencilConvPoolLeaky(
            1024, kernel_size=7, pool=2,
            negative_slope=self.negative_slope, dtype=self.dtype,
        )
        self.conv3a = nn.Conv(512, kernel_size=(7, 1), padding="VALID", dtype=self.dtype)
        self.conv3b = nn.Conv(256, kernel_size=(7, 1), padding="VALID", dtype=self.dtype)
        self.drop = nn.Dropout(self.dropout)
        self.lstm2 = TimeBatchedLSTM(512, dtype=self.dtype)
        # f32 head: see CNNClassifier.fc2 — a bf16 head ties the sigmoid
        # outputs on bf16's grid and argmax becomes compilation-dependent.
        self.head = nn.Dense(self.n_classes)

    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        b, c, t = x.shape
        if c != self.input_channels:
            raise ValueError(f"Expected {self.input_channels} channels, got {c}.")
        if t != self.input_length:
            raise ValueError(f"Expected input length {self.input_length}, got {t}.")

        seq = jnp.transpose(x, (0, 2, 1)).astype(self.dtype)  # (B, T, C)
        x1 = self.lstm1(seq)[:, -1, :]  # (B, lstm_dim)

        # Raw branch: fused stencil conv + pool + leaky on (B, T, C).
        raw = self.conv1(seq)  # (B, t, C, 1024)

        # LSTM branch: last state viewed as a (T, lstm_dim // T) image.
        x1 = self.conv2(x1.reshape((b, t, self.lstm_dim // t)))

        xf = jnp.concatenate([x1, raw], axis=2)  # concat on width

        y = nn.leaky_relu(self.conv3a(xf), negative_slope=self.negative_slope)
        y = nn.max_pool(self.conv3b(y), window_shape=(3, 1), strides=(3, 1))
        y = nn.leaky_relu(y, negative_slope=self.negative_slope)
        y = self.drop(y, deterministic=not train)

        # (B, t', w, 256) -> (B, t', w*256)
        y = y.reshape((y.shape[0], y.shape[1], -1))
        y = self.lstm2(y)[:, -1, :]
        return nn.sigmoid(self.head(y.astype(jnp.float32)))
