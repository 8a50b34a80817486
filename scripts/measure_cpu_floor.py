#!/usr/bin/env python
"""Measure the CPU reference floor for the five BASELINE.json configs.

The reference itself cannot run in this image (pytorch-lightning, librosa,
tdt and textgrid are not installed), so each config's compute hot path is
re-implemented faithfully in NumPy/SciPy/torch-CPU (same architecture,
optimizer, loop structure) and timed on this host. The TPU-side numbers
for the same workloads come from ``bench.py`` and the jitted trainers.

Prints a JSON dict of measurements; paste into BASELINE.md.

Usage: python scripts/measure_cpu_floor.py
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

# Representative shapes: one synthetic subject at the example config's
# scale (96 trials, 12 channels, 0.4 s epochs at 400 Hz).
N_TRIALS, N_CHANNELS, EPOCH_LEN = 96, 12, 160
N_SYLLABLES, N_TONES = 2, 4


def _data(seed=0):
    rng = np.random.default_rng(seed)
    x = rng.standard_normal((N_TRIALS, N_CHANNELS, EPOCH_LEN)).astype(np.float32)
    y_syll = rng.integers(0, N_SYLLABLES, N_TRIALS).astype(np.int64)
    y_tone = rng.integers(0, N_TONES, N_TRIALS).astype(np.int64)
    return x, y_syll, y_tone


def _torch_train(model, x, y, epochs, batch_size, lr=5e-4):
    import torch

    opt = torch.optim.NAdam(model.parameters(), lr=lr)
    loss_fn = torch.nn.CrossEntropyLoss()
    xt, yt = torch.from_numpy(x), torch.from_numpy(y)
    n = xt.shape[0]
    t0 = time.perf_counter()
    for _ in range(epochs):
        perm = torch.randperm(n)
        for i in range(0, n, batch_size):
            idx = perm[i : i + batch_size]
            opt.zero_grad()
            loss = loss_fn(model(xt[idx]), yt[idx])
            loss.backward()
            opt.step()
    return time.perf_counter() - t0


def config1_logistic():
    """Config #1: logistic syllable decode, 60 epochs."""
    import torch.nn as nn

    x, y, _ = _data()
    model = nn.Sequential(
        nn.Flatten(), nn.Linear(N_CHANNELS * EPOCH_LEN, N_SYLLABLES)
    )
    return _torch_train(model, x, y, epochs=60, batch_size=16)


def config2_mlp_plus_selection():
    """Config #2: discriminative channel selection (scipy f_oneway per
    channel x timepoint, the reference's loop) + ShallowNN tone decode."""
    import scipy.stats
    import torch.nn as nn

    x, _, y = _data()

    t0 = time.perf_counter()
    groups = [x[y == k] for k in range(N_TONES)]
    p_vals = np.zeros((N_CHANNELS, EPOCH_LEN))
    for ch in range(N_CHANNELS):  # the reference's double loop
        for t in range(EPOCH_LEN):
            _, p_vals[ch, t] = scipy.stats.f_oneway(
                *[g[:, ch, t] for g in groups]
            )
    anova_s = time.perf_counter() - t0

    hidden = N_CHANNELS * EPOCH_LEN // 2
    model = nn.Sequential(
        nn.Flatten(),
        nn.Linear(N_CHANNELS * EPOCH_LEN, hidden),
        nn.ReLU(),
        nn.Linear(hidden, N_TONES),
    )
    train_s = _torch_train(model, x, y, epochs=60, batch_size=16)
    return anova_s, train_s


def config3_cnn_step():
    """Config #3: paper CNN train step (batch 32) — same measurement as
    bench.py's torch floor."""
    from bench import _torch_cpu_train_step_time

    rng = np.random.default_rng(0)
    x = rng.standard_normal((32, 32, 200)).astype(np.float32)
    y = rng.integers(0, 8, 32).astype(np.int32)
    return _torch_cpu_train_step_time(x, y, 8)


def config4_synthesis_step():
    """Config #4: SynthesisLite train step (torch, reference topology:
    2x Conv1d(32, k5)+BN+pool on ECoG, LSTM(2->64) on labels, dense head)."""
    import torch
    import torch.nn as nn

    n, c, t, out_dim, n_dyn = 32, 8, EPOCH_LEN, 1024, 16

    class TorchSynthesisLite(nn.Module):
        def __init__(self):
            super().__init__()
            self.conv = nn.Sequential(
                nn.Conv1d(c, 32, 5, padding=2), nn.BatchNorm1d(32),
                nn.ReLU(), nn.MaxPool1d(2),
                nn.Conv1d(32, 32, 5, padding=2), nn.BatchNorm1d(32),
                nn.ReLU(), nn.MaxPool1d(2),
            )
            self.lstm = nn.LSTM(2, 64, batch_first=True)
            self.head = nn.Sequential(
                nn.Dropout(0.3), nn.Linear(32 * (t // 4) + 64, 512),
                nn.ReLU(), nn.Linear(512, out_dim),
            )

        def forward(self, ecog, labels):
            a = self.conv(ecog).flatten(1)
            b = self.lstm(labels.transpose(1, 2))[0][:, -1]
            return self.head(torch.cat([a, b], dim=1))

    rng = np.random.default_rng(0)
    ecog = torch.from_numpy(
        rng.standard_normal((n, c, t)).astype(np.float32)
    )
    labels = torch.from_numpy(
        rng.standard_normal((n, 2, n_dyn)).astype(np.float32)
    )
    target = torch.from_numpy(
        rng.standard_normal((n, out_dim)).astype(np.float32)
    )

    model = TorchSynthesisLite()
    opt = torch.optim.NAdam(model.parameters(), lr=5e-4)
    loss_fn = nn.L1Loss()

    def step():
        opt.zero_grad()
        loss = loss_fn(model(ecog, labels), target)
        loss.backward()
        opt.step()

    step()  # warmup
    reps = 10
    t0 = time.perf_counter()
    for _ in range(reps):
        step()
    return (time.perf_counter() - t0) / reps


def config5_preprocess():
    """Config #5's dominant cost: the raw preprocess chain (60 s, 128 ch)
    — the same floor bench.py measures."""
    from bench import cpu_reference_chain

    rng = np.random.default_rng(0)
    data = rng.standard_normal((128, int(3052 * 60))).astype(np.float32)
    t0 = time.perf_counter()
    cpu_reference_chain(data, 3052.0, 400.0)
    return time.perf_counter() - t0


def main():
    out = {}
    out["config1_logistic_train60ep_s"] = round(config1_logistic(), 3)
    anova_s, mlp_s = config2_mlp_plus_selection()
    out["config2_anova_selection_s"] = round(anova_s, 3)
    out["config2_mlp_train60ep_s"] = round(mlp_s, 3)
    out["config3_cnn_step_s"] = round(config3_cnn_step(), 4)
    out["config4_synthesis_step_s"] = round(config4_synthesis_step(), 5)
    out["config5_preprocess_60s128ch_s"] = round(config5_preprocess(), 3)
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
