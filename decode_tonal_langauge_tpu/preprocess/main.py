"""Preprocess stage entry.

``run(config) -> setup_dir`` resolves the pipeline / IO / preprocessor
plugin modules from the config and dispatches, returning the output
directory so the pipeline runner can thread it downstream. (The reference's
``preprocess_main`` only exposes ``main(config_path)``, which the runner's
``run(config)`` contract can't actually call — fixed here; cf.
``/root/reference/preprocess_main.py:8-26`` and
``/root/reference/main.py:28-49``.)
"""

from __future__ import annotations

import sys

from .. import registry
from ..config import dict_to_namespace, load_config


def run(config: dict) -> str:
    pre_cfg = config.get("preprocess", {}).get("params", {})

    pipeline_cfg = pre_cfg.get("pipeline", {})
    io_cfg = pre_cfg.get("io", {})
    preprocessor_cfg = pre_cfg.get(
        "preprocessor", {"module": "preprocess.preprocessor"}
    )
    modalities_cfg = pre_cfg.get("modalities", {})

    pipeline_module = registry.resolve(pipeline_cfg.get("module"))
    preprocessor_module = registry.resolve(preprocessor_cfg.get("module"))
    io_module = registry.resolve(io_cfg.get("module"))

    pipeline_params = dict_to_namespace(pipeline_cfg.get("params", {}))
    io_params = dict_to_namespace(io_cfg.get("params", {}))

    # Device-mesh parallelism for the stage (SURVEY §7's sharded
    # blockwise filtering): with `parallel: {data: N}`, each queued
    # block's fused step chain is dispatched round-robin to a different
    # local device (computation follows data; blocks are embarrassingly
    # parallel, so zero collectives). Guarded by signature so custom
    # pipeline plugins with the reference's 5-arg `run` keep working.
    kwargs = {}
    parallel_cfg = config.get("parallel")
    if parallel_cfg:
        import inspect

        import jax

        from ..parallel.mesh import mesh_from_config

        mesh = mesh_from_config(parallel_cfg)
        if mesh is not None:
            local = [
                d
                for d in mesh.devices.flat
                if d.process_index == jax.process_index()
            ]
            if "devices" in inspect.signature(pipeline_module.run).parameters:
                kwargs["devices"] = local
                print(
                    f"preprocess on {len(local)} devices "
                    "(block round-robin)"
                )
            else:
                print(
                    "parallel: set but the pipeline plugin takes no "
                    "`devices` argument; preprocessing single-device"
                )

    return pipeline_module.run(
        pipeline_params, io_params, io_module, preprocessor_module,
        modalities_cfg, **kwargs,
    )


def main(config_path: str) -> str:
    return run(load_config(config_path))


if __name__ == "__main__":
    if len(sys.argv) != 2:
        raise SystemExit("Usage: python -m decode_tonal_langauge_tpu.preprocess.main <config.yaml>")
    from ..runtime.platform import honor_jax_platforms_env

    honor_jax_platforms_env()
    main(sys.argv[1])
