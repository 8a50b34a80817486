"""Package entry point: ``python -m decode_tonal_langauge_tpu <config.yaml>``.

The direct analogue of the reference's ``python main.py config.yaml``
(``/root/reference/main.py:75-79``) — delegates to the pipeline runner.
"""

import sys

from .runtime.platform import honor_jax_platforms_env

honor_jax_platforms_env()

from .pipeline import run_pipeline

if len(sys.argv) != 2:
    raise SystemExit(
        "Usage: python -m decode_tonal_langauge_tpu <config.yaml>"
    )
run_pipeline(sys.argv[1])
