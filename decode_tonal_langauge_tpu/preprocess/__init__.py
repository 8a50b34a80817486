"""Preprocess stage: config-driven signal pipelines over raw recordings.

Keeps the reference's plugin contracts — a stage entry
(``run(config) -> output_dir``), a pipeline module
(``run(pipeline_params, io_params, io_module, preprocessor_module,
modalities_cfg)``), an IO backend (``load_block``/``save_block``) and
signal-op step modules (``run(data, params) -> ndarray``) — while the
numeric work routes through the jitted ops in
``decode_tonal_langauge_tpu.ops``.

Reference layout: ``/root/reference/preprocess_main.py``,
``/root/reference/preprocess/``.
"""
