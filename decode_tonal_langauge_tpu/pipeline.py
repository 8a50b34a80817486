"""YAML pipeline runner — the framework's top-level API.

Same contract as ``/root/reference/main.py:8-72``: run the stages listed
in ``STAGES`` in fixed order, resolving each stage's ``module`` (default
function ``run``) through the plugin registry, and thread string results
(output directories) into downstream stages' ``params.io`` sections.
"""

from __future__ import annotations

import sys
from typing import Any, Dict

from . import registry
from .config import load_config
from .runtime.profiling import StageTimer, trace

STAGES = [
    "preprocess",
    "sample_collection",
    "channel_selection",
    "training",
    "evaluation",
    "visualisation",
]


def run_pipeline(config_path_or_dict) -> Dict[str, str]:
    """Execute pipeline stages defined in a config file or dict.

    Returns the map of stage -> output directory. A top-level
    ``profiling`` section enables observability: ``trace_dir`` wraps every
    stage in a ``jax.profiler`` trace, ``timing: true`` (default) prints a
    per-stage wall-clock summary at the end.
    """
    if isinstance(config_path_or_dict, str):
        config: Dict[str, Any] = load_config(config_path_or_dict)
    else:
        config = config_path_or_dict
    stage_outputs: Dict[str, str] = {}

    # Multi-host bootstrap FIRST (no-op without a coordinator address):
    # jax.distributed.initialize refuses to run once XLA is initialised,
    # and enabling the compile cache with no explicit dir resolves
    # jax.default_backend() — so the cache must wait its turn or every
    # multi-host launch (JAX_COORDINATOR_ADDRESS set) dies at startup.
    from .parallel.distributed import initialize as distributed_initialize

    if distributed_initialize():
        import jax

        print(
            f"multi-host runtime: process {jax.process_index()} "
            f"of {jax.process_count()}"
        )

    # Persistent XLA compile cache (default on): re-runs skip the
    # 100-230 s of jit compiles that dominate a fresh process's wall.
    # YAML: `compilation_cache: false` disables, a string sets the dir.
    from .runtime.compilation_cache import enable_compilation_cache

    enable_compilation_cache(config.get("compilation_cache", True))

    profiling_cfg = config.get("profiling") or {}
    trace_dir = profiling_cfg.get("trace_dir")
    timer = StageTimer()

    for stage in STAGES:
        stage_cfg = config.get(stage)
        if not stage_cfg:
            continue

        module_name = stage_cfg.get("module")
        func_name = stage_cfg.get("function", "run")
        if module_name is None:
            continue

        print(f"----------- Running stage: {stage} -----------")

        update_stage_cfg_io(stage_outputs, stage, stage_cfg)
        config[stage] = stage_cfg

        module = registry.resolve(module_name)
        try:
            func = getattr(module, func_name)
        except AttributeError:
            raise ImportError(
                f"Module '{module_name}' does not have a function '{func_name}'"
                f"Available functions: {', '.join(dir(module))}"
            )

        with timer.span(stage), trace(trace_dir):
            result = func(config)
        if isinstance(result, str):
            stage_outputs[stage] = result

        # Multi-host: stages shard work across processes (blocks,
        # subjects); downstream stages read the PREVIOUS stage's files,
        # so every process must have finished writing before any process
        # proceeds. No-op single-process.
        from .parallel.distributed import barrier

        barrier(f"stage:{stage}")

    if timer.spans and profiling_cfg.get("timing", True):
        print("----------- Stage timing -----------")
        print(timer.summary())

    return stage_outputs


def update_stage_cfg_io(stage_outputs: dict, stage: str, stage_cfg: dict) -> None:
    """Thread upstream output dirs into this stage's io params."""
    if stage == "sample_collection":
        params_io = stage_cfg.setdefault("params", {}).setdefault("io", {})
        if "recording_dir" not in params_io and "preprocess" in stage_outputs:
            params_io["recording_dir"] = stage_outputs["preprocess"]
    elif stage == "channel_selection":
        io_cfg = stage_cfg.setdefault("params", {}).setdefault("io", {})
        if "sample_dir" not in io_cfg and "sample_collection" in stage_outputs:
            io_cfg["sample_dir"] = stage_outputs["sample_collection"]
    elif stage == "training":
        params_io = stage_cfg.setdefault("params", {}).setdefault("io", {})
        if "sample_dir" not in params_io and "sample_collection" in stage_outputs:
            params_io["sample_dir"] = stage_outputs["sample_collection"]
        if (
            "channel_selection_dir" not in params_io
            and "channel_selection" in stage_outputs
        ):
            params_io["channel_selection_dir"] = stage_outputs["channel_selection"]
    elif stage == "evaluation":
        params_io = stage_cfg.setdefault("params", {}).setdefault("io", {})
        if "training_dir" not in params_io and "training" in stage_outputs:
            params_io["training_dir"] = stage_outputs["training"]
        if "sample_dir" not in params_io and "sample_collection" in stage_outputs:
            params_io["sample_dir"] = stage_outputs["sample_collection"]
        if (
            "channel_selection_dir" not in params_io
            and "channel_selection" in stage_outputs
        ):
            params_io["channel_selection_dir"] = stage_outputs["channel_selection"]
    elif stage == "visualisation":
        params_io = stage_cfg.setdefault("params", {}).setdefault("io", {})
        if "results_dir" not in params_io and "training" in stage_outputs:
            params_io["results_dir"] = stage_outputs["training"]
        if (
            "channel_selection_dir" not in params_io
            and "channel_selection" in stage_outputs
        ):
            params_io["channel_selection_dir"] = stage_outputs["channel_selection"]


if __name__ == "__main__":
    if len(sys.argv) != 2:
        raise SystemExit("Usage: python -m decode_tonal_langauge_tpu.pipeline <config.yaml>")
    from .runtime.platform import honor_jax_platforms_env

    honor_jax_platforms_env()
    run_pipeline(sys.argv[1])
