"""String-addressed plugin resolution.

Everything in the reference is an importlib-resolved plugin: pipeline stages
(``/root/reference/main.py:39``), preprocess steps
(``/root/reference/preprocess/preprocessor.py:58``), channel-selection methods
(``/root/reference/channel_selection_main.py:64``) and model classes
(``/root/reference/models/classifier_factory.py:37-39``). We keep that
contract, with two additions:

1. a short-name registry so configs can say ``downsample`` instead of a full
   dotted path, and
2. an alias table that maps the reference repo's dotted module paths (as they
   appear in its ``example_config.yaml``) to our TPU-native modules, so
   reference configs run unmodified.

Arbitrary user dotted paths still work via :func:`resolve` (the escape hatch).
"""

from __future__ import annotations

import importlib
from typing import Dict

_PKG = "decode_tonal_langauge_tpu"

# Reference dotted path (or short name) -> our module path.
_ALIASES: Dict[str, str] = {
    # --- pipeline stages (reference main.py stage modules) ---
    "preprocess_main": f"{_PKG}.preprocess.main",
    "extract_samples": f"{_PKG}.data.extract_samples",
    "channel_selection_main": f"{_PKG}.channel_selection.main",
    "train_classifier": f"{_PKG}.training.train_classifier",
    "evaluation_main": f"{_PKG}.evaluation.main",
    "visualisation_main": f"{_PKG}.visualisation.main",
    # --- preprocess sub-plugins ---
    "preprocess.pipelines.subject_block": f"{_PKG}.preprocess.pipelines.subject_block",
    "preprocess.io.tdt_blocks": f"{_PKG}.preprocess.io.tdt_blocks",
    "preprocess.io.npz_blocks": f"{_PKG}.preprocess.io.npz_blocks",
    "preprocess.preprocessor": f"{_PKG}.preprocess.preprocessor",
    # --- signal op steps (both the example_config's short form
    #     "preprocess.<op>" and the real reference path "preprocess.signal.<op>") ---
    "preprocess.downsample": f"{_PKG}.preprocess.signal.downsample",
    "preprocess.signal.downsample": f"{_PKG}.preprocess.signal.downsample",
    "preprocess.frequency_filter": f"{_PKG}.preprocess.signal.frequency_filter",
    "preprocess.signal.frequency_filter": f"{_PKG}.preprocess.signal.frequency_filter",
    "preprocess.car_rereference": f"{_PKG}.preprocess.signal.car_rereference",
    "preprocess.signal.car_rereference": f"{_PKG}.preprocess.signal.car_rereference",
    "preprocess.zscore_rereference": f"{_PKG}.preprocess.signal.zscore_rereference",
    "preprocess.signal.zscore_rereference": f"{_PKG}.preprocess.signal.zscore_rereference",
    "preprocess.channel_zscore": f"{_PKG}.preprocess.signal.channel_zscore",
    "preprocess.signal.channel_zscore": f"{_PKG}.preprocess.signal.channel_zscore",
    "preprocess.rolling_zscore": f"{_PKG}.preprocess.signal.rolling_zscore",
    "preprocess.signal.rolling_zscore": f"{_PKG}.preprocess.signal.rolling_zscore",
    # --- channel selection methods ---
    "channel_selection.active": f"{_PKG}.channel_selection.active",
    "channel_selection.discriminative": f"{_PKG}.channel_selection.discriminative",
    # --- model classes (dotted class paths used in the `model:` config section) ---
    "models.simple_classifiers.LogisticRegressionClassifier": f"{_PKG}.models.simple.LogisticRegressionClassifier",
    "models.simple_classifiers.ShallowNNClassifier": f"{_PKG}.models.simple.ShallowNNClassifier",
    "models.deep_classifiers.CNNClassifier": f"{_PKG}.models.deep.CNNClassifier",
    "models.deep_classifiers.CNNRNNClassifier": f"{_PKG}.models.deep.CNNRNNClassifier",
    "models.synthesis_models.SynthesisModelCNN": f"{_PKG}.models.synthesis.SynthesisModelCNN",
    "models.synthesis_models.SynthesisLite": f"{_PKG}.models.synthesis.SynthesisLite",
}

# Short names for convenience in new-style configs.
_SHORT_NAMES: Dict[str, str] = {
    "downsample": f"{_PKG}.preprocess.signal.downsample",
    "frequency_filter": f"{_PKG}.preprocess.signal.frequency_filter",
    "car_rereference": f"{_PKG}.preprocess.signal.car_rereference",
    "zscore_rereference": f"{_PKG}.preprocess.signal.zscore_rereference",
    "channel_zscore": f"{_PKG}.preprocess.signal.channel_zscore",
    "rolling_zscore": f"{_PKG}.preprocess.signal.rolling_zscore",
    "active": f"{_PKG}.channel_selection.active",
    "discriminative": f"{_PKG}.channel_selection.discriminative",
}


def canonical_module_path(name: str) -> str:
    """Map a config-supplied module name to the module path to import."""
    if name in _ALIASES:
        return _ALIASES[name]
    if name in _SHORT_NAMES:
        return _SHORT_NAMES[name]
    return name


def resolve(name: str):
    """Import and return the plugin module for a config-supplied name."""
    return importlib.import_module(canonical_module_path(name))


def register_alias(name: str, target: str) -> None:
    """Register an extra plugin alias at runtime (user extension hook)."""
    _ALIASES[name] = target
