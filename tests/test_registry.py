"""Plugin-registry parity: every module/class name a reference config can
contain (cf. /root/reference/example_config.yaml) must resolve here, so
reference configs run unchanged."""

import pytest

from decode_tonal_langauge_tpu import registry

REFERENCE_STAGE_MODULES = [
    "preprocess_main",
    "extract_samples",
    "channel_selection_main",
    "train_classifier",
]

REFERENCE_PLUGIN_MODULES = [
    "preprocess.pipelines.subject_block",
    "preprocess.downsample",
    "preprocess.frequency_filter",
    "preprocess.car_rereference",
    "preprocess.zscore_rereference",
    "preprocess.channel_zscore",
    "preprocess.rolling_zscore",
    "channel_selection.active",
    "channel_selection.discriminative",
]

REFERENCE_MODEL_PATHS = [
    "models.simple_classifiers.LogisticRegressionClassifier",
    "models.simple_classifiers.ShallowNNClassifier",
    "models.deep_classifiers.CNNClassifier",
    "models.deep_classifiers.CNNRNNClassifier",
    "models.synthesis_models.SynthesisModelCNN",
    "models.synthesis_models.SynthesisLite",
]


@pytest.mark.parametrize("name", REFERENCE_STAGE_MODULES)
def test_stage_modules_resolve_with_run(name):
    module = registry.resolve(name)
    assert callable(getattr(module, "run", None) or getattr(module, "main", None))


@pytest.mark.parametrize("name", REFERENCE_PLUGIN_MODULES)
def test_plugin_modules_resolve(name):
    module = registry.resolve(name)
    assert callable(getattr(module, "run", None))


@pytest.mark.parametrize("path", REFERENCE_MODEL_PATHS)
def test_model_paths_resolve_through_factory(path):
    from decode_tonal_langauge_tpu.models.factory import resolve_model_class

    cls = resolve_model_class(path)
    assert isinstance(cls, type)


def test_io_and_preprocessor_plugin_contracts():
    io_mod = registry.resolve("preprocess.io.npz_blocks")
    assert callable(io_mod.load_block) and callable(io_mod.save_block)
    pp = registry.resolve("preprocess.preprocessor")
    assert callable(pp.preprocess_modalities)


def test_tdt_backend_resolves_but_gates_on_import():
    # The tdt package is absent in this image; resolution must work and
    # the load function must raise a clear error, not an ImportError at
    # module import time.
    module = registry.resolve("preprocess.io.tdt_blocks")
    assert hasattr(module, "load_block")


def test_unknown_name_falls_through_to_import_error():
    with pytest.raises(ModuleNotFoundError):
        registry.resolve("definitely.not.a.module")


def test_register_alias_extension_hook():
    registry.register_alias("my.custom.step", "decode_tonal_langauge_tpu.ops.resample")
    module = registry.resolve("my.custom.step")
    assert hasattr(module, "polyphase_resample")
