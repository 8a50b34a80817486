"""Classification metrics with sklearn-name dispatch.

Capability parity with ``/root/reference/utils/metrics.py``: named metrics
(accuracy, weighted f1/precision/recall, cohen_kappa, confusion_matrix),
generic fallback to any ``sklearn.metrics`` function (weighted averaging
when supported), and joint multi-target metrics via mixed-radix label
flattening.
"""

from __future__ import annotations

from typing import Dict, List

import numpy as np
from sklearn import metrics as skmetrics


def compute_classification_metrics(
    true: np.ndarray,
    preds: np.ndarray,
    metrics: List[str] = ["accuracy"],
    verbose: bool = False,
) -> dict:
    """Compute the named metrics for one classification task."""
    if verbose:
        print("Unique labels in true: {}".format(set(np.asarray(true).tolist())))
        print("Unique predictions in preds: {}".format(set(np.asarray(preds).tolist())))

    metric_funcs = {
        "accuracy": skmetrics.accuracy_score,
        "f1_score": lambda t, p: skmetrics.f1_score(t, p, average="weighted"),
        "precision": lambda t, p: skmetrics.precision_score(
            t, p, average="weighted", zero_division=0
        ),
        "recall": lambda t, p: skmetrics.recall_score(
            t, p, average="weighted", zero_division=0
        ),
        "cohen_kappa": skmetrics.cohen_kappa_score,
        "confusion_matrix": skmetrics.confusion_matrix,
    }

    results = {}
    for m in metrics:
        if m in metric_funcs:
            results[m] = metric_funcs[m](true, preds)
        else:
            try:
                metric_func = getattr(skmetrics, m)
            except AttributeError:
                raise ValueError(
                    f"'{m}' is neither a built-in metric "
                    f"not part of the supported metrics: {list(metric_funcs.keys())}."
                )
            if "average" in metric_func.__code__.co_varnames:
                results[m] = metric_func(true, preds, average="weighted")
            else:
                results[m] = metric_func(true, preds)

    return results


def compute_classification_metrics_joint(
    all_true: Dict[str, np.ndarray],
    all_preds: Dict[str, np.ndarray],
    metrics: List[str] = ["accuracy"],
    verbose: bool = False,
) -> dict:
    """Joint metrics over multiple targets via mixed-radix label combine.

    ``joint = sum_i label_i * prod(n_classes[i+1:])`` — the reference's
    first-target-major ordering (``metrics.py:114-139``).
    """
    if set(all_true.keys()) != set(all_preds.keys()):
        raise ValueError("all_true and all_preds must cover the same targets.")

    targets = list(all_true.keys())
    all_true = {t: np.asarray(all_true[t]).astype(int) for t in targets}
    all_preds = {t: np.asarray(all_preds[t]).astype(int) for t in targets}

    if verbose:
        for target in targets:
            print(f"Unique labels in {target}: {set(all_true[target].tolist())}")
            print(f"Unique predictions in {target}: {set(all_preds[target].tolist())}")

    n_classes = [len(np.unique(all_true[t])) for t in targets]
    multipliers = np.array(
        [int(np.prod(n_classes[i + 1 :])) for i in range(len(n_classes))]
    )

    joint_true = sum(
        all_true[t] * m for t, m in zip(targets, multipliers)
    )
    joint_preds = sum(
        all_preds[t] * m for t, m in zip(targets, multipliers)
    )

    return compute_classification_metrics(joint_true, joint_preds, metrics)
