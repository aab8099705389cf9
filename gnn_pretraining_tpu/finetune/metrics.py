"""Evaluation metrics with reference-pipeline parity.

Behavioural port of src/finetune/metrics.py. The quirks are part of the parity
contract (SURVEY.md §6 caveat):

  * split-level metrics are *sample-weighted means of per-batch metrics*
    (:14-33) — NOT global metrics;
  * per-batch AUC is defined 0.0 when the batch is single-class or sklearn
    raises (:64-73); with unshuffled LP loaders this makes split "AUC" land
    around 0.08-0.11 by construction, and it is still the model-selection
    signal (finetune.py:269);
  * binary domains use ``average='binary'`` f1/precision/recall, multiclass
    uses macro (:59).

A corrected global AUC (over the concatenated split) is additionally reported
under ``{prefix}/auc_global`` — extra information, never used for selection.
"""

from __future__ import annotations

import time
from typing import Dict, List, Optional

import numpy as np
from sklearn.metrics import (
    accuracy_score,
    f1_score,
    precision_score,
    recall_score,
    roc_auc_score,
)

from gnn_pretraining_tpu import config


def compute_batch_metrics(domain_name: str, targets: np.ndarray,
                          predictions: np.ndarray, probabilities: np.ndarray,
                          loss: float, prefix: str) -> Dict[str, float]:
    is_binary = config.NUM_CLASSES[domain_name] == 2

    y_true = np.asarray(targets)
    y_pred = np.asarray(predictions)
    y_prob = np.asarray(probabilities)
    if is_binary:
        y_prob = y_prob[:, 1]

    m: Dict[str, float] = {}
    m[f"{prefix}/accuracy"] = float(accuracy_score(y_true, y_pred))

    average = "binary" if is_binary else "macro"
    m[f"{prefix}/f1"] = float(f1_score(y_true, y_pred, average=average,
                                       zero_division=0))
    m[f"{prefix}/precision"] = float(precision_score(y_true, y_pred,
                                                     average=average,
                                                     zero_division=0))
    m[f"{prefix}/recall"] = float(recall_score(y_true, y_pred, average=average,
                                               zero_division=0))

    if len(np.unique(y_true)) < 2:
        m[f"{prefix}/auc"] = 0.0
    else:
        try:
            if is_binary:
                m[f"{prefix}/auc"] = float(roc_auc_score(y_true, y_prob))
            else:
                m[f"{prefix}/auc"] = float(roc_auc_score(y_true, y_prob,
                                                         multi_class="ovr"))
        except (ValueError, RuntimeWarning):
            m[f"{prefix}/auc"] = 0.0

    m[f"{prefix}/loss"] = float(loss)
    m["num_samples"] = int(len(y_true))
    return m


def aggregate_batch_metrics(batch_metrics: List[Dict[str, float]], epoch: int,
                            prefix: str) -> Dict[str, float]:
    metrics: Dict[str, float] = {}
    names = set(batch_metrics[0].keys()) - {"num_samples"}
    total = sum(b["num_samples"] for b in batch_metrics)
    for name in names:
        metrics[name] = sum(b[name] * b["num_samples"]
                            for b in batch_metrics) / total
    if prefix != "val":
        metrics[f"{prefix}/progress/epoch"] = epoch
    return metrics


def compute_global_auc(domain_name: str, all_targets: np.ndarray,
                       all_probs: np.ndarray, prefix: str) -> Dict[str, float]:
    """Side-by-side corrected metric (not in the reference)."""
    is_binary = config.NUM_CLASSES[domain_name] == 2
    y_prob = all_probs[:, 1] if is_binary else all_probs
    try:
        if len(np.unique(all_targets)) < 2:
            auc = 0.0
        elif is_binary:
            auc = float(roc_auc_score(all_targets, y_prob))
        else:
            auc = float(roc_auc_score(all_targets, y_prob, multi_class="ovr"))
    except ValueError:
        auc = 0.0
    return {f"{prefix}/auc_global": auc}


def compute_training_metrics(epoch: int, step: int, loss: float,
                             lrs: Dict[str, float], domain_name: str,
                             targets, predictions, probabilities,
                             step_start_time: float,
                             grad_norm: float) -> Dict[str, float]:
    m = compute_batch_metrics(domain_name, targets, predictions, probabilities,
                              loss, "train")
    for name, lr in lrs.items():
        m[f"train/lr/{name}"] = lr
    m["train/gradients/model_grad_norm"] = float(grad_norm)
    m["train/progress/epoch"] = epoch
    m["train/progress/step"] = step
    m["train/system/time_per_step"] = time.time() - step_start_time
    return m


def compute_validation_metrics(batch_metrics, epoch):
    return aggregate_batch_metrics(batch_metrics, epoch, "val")


def compute_test_metrics(batch_metrics, epoch: int,
                         epochs_since_improvement: int,
                         training_start_time: float,
                         total_parameters: int,
                         trainable_parameters: int) -> Dict[str, float]:
    m = aggregate_batch_metrics(batch_metrics, epoch, "test")
    m["test/convergence_epochs"] = epoch - epochs_since_improvement
    m["test/training_time"] = time.time() - training_start_time
    m["test/total_parameters"] = total_parameters
    m["test/trainable_parameters"] = trainable_parameters
    return m
