"""Shipped example configs must stay loadable and fully resolvable.

``configs/*.yaml`` are product surface (README quickstart and the
CONFIG.md bf16 fast-path recipe); this guards every plugin path, model
path, and ``parallel:`` section in them against drift as the registry
and module layout evolve. The e2e behaviour of the example config is
covered by tests/test_pipeline_e2e.py; here we only assert resolution,
which is what breaks silently when a module moves.
"""

import glob
import os

import pytest

from decode_tonal_langauge_tpu import registry
from decode_tonal_langauge_tpu.config import load_config
from decode_tonal_langauge_tpu.models.factory import resolve_model_class
from decode_tonal_langauge_tpu.parallel.mesh import mesh_from_config
from decode_tonal_langauge_tpu.pipeline import STAGES

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CONFIGS = sorted(glob.glob(os.path.join(REPO, "configs", "*.yaml")))
IDS = [os.path.basename(p) for p in CONFIGS]


def test_configs_directory_is_populated():
    assert any(os.path.basename(p) == "example_config.yaml" for p in CONFIGS)
    assert any(os.path.basename(p) == "fast_bf16.yaml" for p in CONFIGS)


@pytest.mark.parametrize("path", CONFIGS, ids=IDS)
def test_stage_modules_resolve(path):
    config = load_config(path)
    resolved = 0
    for stage in STAGES:
        stage_cfg = config.get(stage)
        if not stage_cfg or not stage_cfg.get("module"):
            continue
        module = registry.resolve(stage_cfg["module"])
        func_name = stage_cfg.get("function", "run")
        assert callable(getattr(module, func_name, None)), (
            f"{path}: stage '{stage}' module "
            f"'{stage_cfg['module']}' lacks callable '{func_name}'"
        )
        resolved += 1
    assert resolved >= 4  # a shipped config exercises most of the pipeline


@pytest.mark.parametrize("path", CONFIGS, ids=IDS)
def test_nested_plugins_resolve(path):
    config = load_config(path)

    pre = config.get("preprocess", {}).get("params", {})
    for section in ("pipeline", "io", "preprocessor"):
        sub = pre.get(section)
        if sub and sub.get("module"):
            registry.resolve(sub["module"])
    for modality in pre.get("modalities", {}).values():
        steps = (modality.get("preprocessing") or {}).get("steps", [])
        for step in steps:
            module = registry.resolve(step["module"])
            assert callable(getattr(module, "run", None))

    for sel in config.get("channel_selection", {}).get("params", {}).get(
        "selections", []
    ):
        module = registry.resolve(sel["module"])
        assert callable(getattr(module, "run", None))


@pytest.mark.parametrize("path", CONFIGS, ids=IDS)
def test_model_path_resolves(path):
    model_cfg = load_config(path).get("model")
    if not model_cfg:
        pytest.skip(f"{path} has no model section")
    cls = resolve_model_class(model_cfg["model"])
    assert isinstance(cls, type)
    for override in (model_cfg.get("per_target") or {}).values():
        if "model" in override:
            assert isinstance(resolve_model_class(override["model"]), type)


@pytest.mark.parametrize("path", CONFIGS, ids=IDS)
def test_parallel_section_builds_a_mesh(path):
    parallel_cfg = load_config(path).get("parallel")
    if not parallel_cfg:
        pytest.skip(f"{path} has no parallel section")
    mesh = mesh_from_config(parallel_cfg)
    # conftest forces an 8-device virtual CPU platform; 'auto' fills it,
    # an explicit count must be honored exactly.
    if isinstance(parallel_cfg, dict):
        data = parallel_cfg.get("data", "auto")
        model = int(parallel_cfg.get("model", 1))
        expected = (8 // model) * model if data in ("auto", None) else int(data) * model
    else:  # 'auto' / true shorthand
        expected = 8
    assert mesh is not None and mesh.devices.size == expected
