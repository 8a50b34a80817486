"""Preprocessor core: per-modality sequential step application.

Same contract as the reference (``/root/reference/preprocess/preprocessor.py``):
- per modality, clone the base params and inject ``signal_freq`` from
  ``<modality>_sf``,
- apply each configured step module's ``run(data, params)`` in order,
- reject parameter-name collisions between steps,
- optionally emit before/after figures per step.
"""

from __future__ import annotations

import os
from argparse import Namespace
from copy import deepcopy
from typing import Optional

import numpy as np

from .. import registry


def preprocess_modalities(
    data_dict: dict,
    modalities_cfg: dict,
    base_params: Namespace,
    figure_dir: Optional[str] = None,
    device=None,
) -> dict:
    """Preprocess each modality according to its type and configured steps.

    ``device``: optional placement for this block's compute — the input
    is device_put there and every op follows its data, so the pipeline
    can round-robin whole blocks across a mesh's chips."""
    for modality, cfg in modalities_cfg.items():
        mod_type = cfg.get("type")
        if mod_type is None:
            raise KeyError(f"Modality '{modality}' missing 'type' field in config")

        steps = cfg.get("preprocessing", {}).get("steps", [])
        if not steps:
            continue

        mod_fig_dir = os.path.join(figure_dir, modality) if figure_dir else None
        if mod_fig_dir:
            os.makedirs(mod_fig_dir, exist_ok=True)

        params = deepcopy(base_params)

        if mod_type == "signal":
            params.signal_freq = data_dict.get(f"{modality}_sf")
            processed, freq = preprocess_signal(
                data_dict[modality], steps, params, figure_dir=mod_fig_dir,
                device=device,
            )
            if freq is not None:
                data_dict[f"{modality}_sf"] = freq
            data_dict[modality] = processed
        else:
            raise ValueError(
                f"Unsupported modality type '{mod_type}' for '{modality}'."
            )

    return data_dict


def preprocess_signal(
    data: np.ndarray,
    steps: list,
    block_params: Namespace,
    figure_dir: Optional[str] = None,
    num_channels: int = 5,
    duration: float = 1.0,
    device=None,
):
    """Apply preprocessing steps sequentially; returns (data, final_freq).

    Without figures, the WHOLE step chain runs as one jitted function
    (cached per steps-config / input shape / signal params): one device
    dispatch per block instead of one per step, and XLA fuses across
    step boundaries (e.g. the z-score into the filter output) instead of
    spilling each intermediate to HBM. Plugins that cannot trace (host
    side effects, data-dependent shapes) fall back to the eager per-step
    path automatically.

    ``device``: optional explicit placement — the input is device_put
    there and the (shared, shape-keyed) jitted chain executes on it, so
    concurrent blocks can occupy different chips of a mesh.
    """
    _apply_step_params(steps, block_params)
    if device is not None:
        import jax

        data = jax.device_put(data, device)

    if figure_dir is None:
        import jax

        try:
            return _preprocess_signal_fused(data, steps, block_params)
        except (
            jax.errors.TracerArrayConversionError,
            jax.errors.ConcretizationTypeError,
            jax.errors.TracerBoolConversionError,
        ) as err:
            print(
                f"Preprocessing chain is not jit-traceable ({err}); "
                "falling back to per-step dispatch."
            )
        except jax.errors.JaxRuntimeError as err:
            # The chain traced but failed to compile/execute as ONE
            # program (e.g. scratch OOM a per-step schedule avoids).
            # Poison the cache so later blocks skip the fused attempt.
            _FUSED_CHAINS[_fused_cache_key(data, steps, block_params)] = None
            print(
                f"Fused preprocessing chain failed at runtime ({err}); "
                "falling back to per-step dispatch."
            )

    for i, step in enumerate(steps):
        module_name = step["module"]
        # Materializing the pre-step signal costs a device->host readback
        # per step — only pay it when figures are actually requested.
        before_data = np.asarray(data) if figure_dir else None
        before_freq = block_params.signal_freq

        module = registry.resolve(module_name)
        data = module.run(data, block_params)

        if figure_dir and np.ndim(data) == 2:
            from ..utils.visualise import plot_preprocessing_step

            plot_preprocessing_step(
                before_data,
                before_freq,
                np.asarray(data),
                block_params.signal_freq,
                figure_dir,
                i,
                module_name,
                num_channels=num_channels,
                duration=duration,
            )

    return data, block_params.signal_freq


def _apply_step_params(steps: list, block_params: Namespace) -> None:
    """Install each step's params on the shared namespace, rejecting
    collisions (reference contract)."""
    for step in steps:
        for key, value in (step.get("params", {}) or {}).items():
            if hasattr(block_params, key):
                raise ValueError(
                    f"Parameter '{key}' already exists in params. "
                    "Please ensure no conflicting parameter names "
                    "in each preprocessing step."
                )
            setattr(block_params, key, value)


# (chain fn, final signal_freq) per (steps, signal params, input spec).
_FUSED_CHAINS: dict = {}

# Per-block identifiers plugins must not bake into traced compute (they
# vary per block; including them would defeat the chain cache).
_FUSE_KEY_EXCLUDE = ("block_id", "subject_id")


def _fused_cache_key(data, steps, block_params: Namespace):
    step_key = tuple(
        (step["module"], repr(sorted((step.get("params") or {}).items(), key=repr)))
        for step in steps
    )
    param_key = repr(
        sorted(
            (
                (k, v)
                for k, v in vars(block_params).items()
                if k not in _FUSE_KEY_EXCLUDE
            ),
            key=repr,
        )
    )
    return (step_key, param_key, tuple(data.shape), str(data.dtype))


def _preprocess_signal_fused(data, steps: list, block_params: Namespace):
    import jax

    key = _fused_cache_key(data, steps, block_params)
    cached = _FUSED_CHAINS.get(key)
    if cached is None and key in _FUSED_CHAINS:
        # Poisoned: this chain failed to compile/run fused before.
        import jax

        raise jax.errors.JaxRuntimeError(
            "fused preprocessing chain previously failed; using eager path"
        )
    if cached is None:
        modules = [registry.resolve(step["module"]) for step in steps]
        freq_out = {}

        def chain(x):
            # Fresh namespace per trace: plugins mutate signal_freq.
            trace_params = Namespace(**vars(block_params))
            for module in modules:
                x = module.run(x, trace_params)
            freq_out["final"] = trace_params.signal_freq
            return x

        fn = jax.jit(chain)
        # Abstract trace now (no compile) so a non-traceable plugin
        # raises here — the caller falls back — and the final
        # signal_freq is known before the first real call.
        jax.eval_shape(chain, jax.ShapeDtypeStruct(data.shape, data.dtype))
        cached = (fn, freq_out["final"], {"validated": False})
        _FUSED_CHAINS[key] = cached

    fn, final_freq, state = cached
    out = fn(data)
    if not state["validated"]:
        # Dispatch is async: an execution failure (e.g. scratch OOM)
        # would otherwise surface later at the writer thread's
        # materialization, past the caller's fallback handler. Fence the
        # FIRST execution of each chain so runtime failures reach the
        # cache-poisoning except clause; once a chain has run, later
        # blocks skip the sync and keep load/compute overlap.
        jax.block_until_ready(out)
        state["validated"] = True
    block_params.signal_freq = final_freq  # observable contract of the
    # eager path: plugins update the namespace's rate as they run
    return out, final_freq
