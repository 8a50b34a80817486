"""Configuration system: YAML loading, namespace views, hashing, provenance.

Capability parity with the reference config layer
(``/root/reference/utils/config.py:8-84``): YAML loading, recursive
dict -> attribute-namespace conversion with ``exclude_keys``, JSON
append-merge, provenance chaining (each stage copies its upstream
``config.yaml`` and appends its own section), and md5 content-hashed
run/output naming so identical configs reuse output directories.
"""

from __future__ import annotations

import hashlib
import json
import os
from argparse import Namespace
from typing import Any, Dict, Iterable, Optional

import yaml


def load_config(path: str) -> dict:
    """Load a YAML configuration file into a plain dict."""
    with open(path, "r") as f:
        return yaml.safe_load(f)


def save_config(path: str, config: dict) -> None:
    """Write a config dict as YAML."""
    with open(path, "w") as f:
        yaml.dump(config, f)


def dict_to_namespace(d: Any, exclude_keys: Optional[Iterable[str]] = None) -> Any:
    """Recursively convert a dict into an ``argparse.Namespace``.

    Keys listed in ``exclude_keys`` keep their raw dict/list values (used for
    free-form mappings such as ``class_labels`` and ``model_kwargs``; cf.
    ``/root/reference/utils/config.py:14-27``).
    """
    if exclude_keys is None:
        exclude_keys = set()
    else:
        exclude_keys = set(exclude_keys)

    if isinstance(d, dict):
        return Namespace(
            **{
                k: (dict_to_namespace(v, exclude_keys) if k not in exclude_keys else v)
                for k, v in d.items()
            }
        )
    if isinstance(d, list):
        return [dict_to_namespace(v, exclude_keys) for v in d]
    return d


def namespace_to_dict(ns: Any) -> Any:
    """Inverse of :func:`dict_to_namespace` (best-effort, for provenance dumps)."""
    if isinstance(ns, Namespace):
        return {k: namespace_to_dict(v) for k, v in vars(ns).items()}
    if isinstance(ns, (list, tuple)):
        return [namespace_to_dict(v) for v in ns]
    return ns


def append_data_json(output_file: str, output_data: dict) -> None:
    """Append/merge ``output_data`` into a JSON file, creating it if needed."""
    if os.path.exists(output_file):
        with open(output_file, "r") as f:
            try:
                existing = json.load(f)
            except json.JSONDecodeError:
                existing = {}
        existing.update(output_data)
        with open(output_file, "w") as f:
            json.dump(existing, f, indent=4)
    else:
        with open(output_file, "w") as f:
            json.dump(output_data, f, indent=4)


def update_configuration(
    output_path: str,
    previous_config_path: str,
    new_module: str,
    new_module_cfg: dict,
) -> None:
    """Provenance chaining: merge the upstream stage's ``config.yaml`` with
    this stage's section and write the result to ``output_path``.

    Mirrors ``/root/reference/utils/config.py:58-71``.
    """
    if os.path.exists(previous_config_path):
        previous_cfg = load_config(previous_config_path) or {}
    else:
        previous_cfg = {}

    previous_cfg[new_module] = new_module_cfg
    save_config(output_path, previous_cfg)


def _stable_json(config: Any) -> str:
    """Deterministically serialize a config for hashing."""
    return json.dumps(config, sort_keys=True, default=str)


def generate_hash_name_from_config(base_name: str, config: dict) -> str:
    """``<base>__<md5[:6]>`` content-hashed run name.

    Identical configs map to identical directories, so re-runs skip work
    (the reference's recompute-avoidance "resume";
    ``/root/reference/utils/config.py:74-84``).
    """
    hash_part = hashlib.md5(_stable_json(config).encode()).hexdigest()[:6]
    return f"{base_name}__{hash_part}"


def flatten_sections(cfg: Dict[str, Any], sections: Iterable[str]) -> Dict[str, Any]:
    """Merge the listed sub-sections of ``cfg`` into one flat dict.

    Reference behaviour: the training stage flattens ``io``/``experiment``/
    ``training`` into a single params namespace
    (``/root/reference/train_classifier.py:25-27``).
    """
    flat: Dict[str, Any] = {}
    for section in sections:
        flat.update(cfg.get(section, {}) or {})
    return flat


# Keys whose values must stay raw dicts/lists when a training config (or
# its provenance) is namespaced: free-form mappings consumed as dicts.
PROVENANCE_EXCLUDE_KEYS = ("class_labels", "model_kwargs", "per_target")


def flatten_training_provenance(provenance: Dict[str, Any]) -> Dict[str, Any]:
    """Flatten a training run's provenance config to the training stage's
    params dict: io/experiment/training sections + dataset + model.

    Single source of truth for the recovery that the evaluation stage and
    ``serving --training_dir`` perform — all consumers MUST flatten
    identically to ``train_classifier.run`` or checkpoint names and split
    reproduction silently diverge from what was trained.
    """
    flat = flatten_sections(
        (provenance.get("training", {}) or {}).get("params", {}) or {},
        ("io", "experiment", "training"),
    )
    flat.update(provenance.get("dataset", {}) or {})
    flat.update(provenance.get("model", {}) or {})
    return flat


def namespace_training_params(flat: Dict[str, Any]):
    """``dict_to_namespace`` with the training exclude-keys and the
    ``model_name`` fallback (class name of the model path) applied —
    the same derivation ``train_classifier.run`` uses."""
    params = dict_to_namespace(flat, exclude_keys=list(PROVENANCE_EXCLUDE_KEYS))
    if getattr(params, "model_name", None) is None and "model" in flat:
        params.model_name = flat["model"].split(".")[-1]
    return params
