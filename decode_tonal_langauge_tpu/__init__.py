"""TPU-native tonal-language BCI decoding framework.

A brand-new JAX/XLA/Pallas implementation of the capability surface of
``Daniel-Lin-S/decode_tonal_langauge`` (an unofficial implementation of
Liu et al., *Decoding and synthesizing tonal language speech from brain
activity*, Sci. Adv. 2023):

- raw ECoG preprocessing (FFT resampling, Butterworth/FIR filtering,
  Gaussian Hilbert filter-bank high-gamma envelopes, CAR / z-score
  re-referencing) as fused, jitted JAX ops (``ops/``, ``preprocess/``),
- TextGrid-aligned ERP epoch extraction (``data/``),
- vectorized ANOVA-based active / discriminative electrode selection
  (``channel_selection/``),
- tone & syllable classifiers (logistic / MLP / paper CNN / CNN-RNN) and
  ECoG -> Mel-spectrogram speech synthesis models in Flax with on-device
  Griffin-Lim reconstruction (``models/``, ``training/``, ``utils/audio.py``),
- a YAML pipeline runner with the same stage contract as the reference
  (``pipeline.py``; see ``/root/reference/main.py:8-72``),
- device-mesh data parallelism over trials / seeds / channels
  (``parallel/``), which has no reference counterpart.

The package name mirrors the reference repo name (including its original
spelling) with a ``_tpu`` suffix.
"""

__version__ = "0.1.0"

from . import config  # noqa: F401
