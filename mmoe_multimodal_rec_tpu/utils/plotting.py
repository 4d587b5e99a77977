"""Matplotlib artifacts matching the reference's outputs: per-step and
per-epoch loss curves (train.py:372-419; 3-panel HoME variant
train_HoME.py:458-530) and ROC curves (inference_and_auc.py:44-64,
infer_auc_HoME:217-233)."""
from __future__ import annotations

import os
from typing import Dict, Sequence

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402


def plot_loss_curves(steps: Sequence[int], losses: Dict[str, Sequence[float]],
                     output_dir: str, prefix: str = "train") -> str:
    """One stacked panel per loss series (total/main/contrastive)."""
    os.makedirs(output_dir, exist_ok=True)
    series = {k: v for k, v in losses.items() if len(v)}
    n = max(len(series), 1)
    fig, axes = plt.subplots(n, 1, figsize=(10, 4 * n), squeeze=False)
    for ax, (name, vals) in zip(axes[:, 0], series.items()):
        ax.plot(steps[:len(vals)], vals, lw=1)
        ax.set_title(name)
        ax.set_xlabel("optimizer step")
        ax.set_ylabel("loss")
        ax.grid(True, alpha=0.3)
    fig.tight_layout()
    path = os.path.join(output_dir, f"{prefix}_loss_curves.png")
    fig.savefig(path, dpi=150)
    plt.close(fig)
    return path


def plot_epoch_losses(epoch_losses: Dict[str, Sequence[float]],
                      output_dir: str, prefix: str = "train") -> str:
    os.makedirs(output_dir, exist_ok=True)
    fig, ax = plt.subplots(figsize=(8, 5))
    for name, vals in epoch_losses.items():
        if len(vals):
            ax.plot(range(len(vals)), vals, marker="o", label=name)
    ax.set_xlabel("epoch")
    ax.set_ylabel("avg loss")
    if any(len(v) for v in epoch_losses.values()):
        ax.legend()
    ax.grid(True, alpha=0.3)
    path = os.path.join(output_dir, f"{prefix}_epoch_losses.png")
    fig.savefig(path, dpi=150)
    plt.close(fig)
    return path


def plot_roc(curves: Dict[str, tuple], output_dir: str,
             filename: str = "roc_curve.png") -> str:
    """curves: {task: (fpr, tpr, auc)} -> combined ROC plot."""
    os.makedirs(output_dir, exist_ok=True)
    fig, ax = plt.subplots(figsize=(8, 6))
    for task, (fpr, tpr, auc) in curves.items():
        ax.plot(fpr, tpr, lw=2, label=f"{task} (AUC={auc:.4f})")
    ax.plot([0, 1], [0, 1], ls="--", lw=1, color="gray",
            label="random (AUC=0.5)")
    ax.set_xlim(0, 1)
    ax.set_ylim(0, 1.05)
    ax.set_xlabel("False Positive Rate")
    ax.set_ylabel("True Positive Rate")
    ax.set_title("ROC curves")
    ax.legend(loc="lower right")
    ax.grid(True, alpha=0.3)
    path = os.path.join(output_dir, filename)
    fig.savefig(path, dpi=150)
    plt.close(fig)
    return path
