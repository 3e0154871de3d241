"""Plot helpers (reference utils/ploting_utils.py, 201 LoC): histogram with
percentile markers, metric curve with min/last annotations, bar plot. All
return the save path; matplotlib Agg backend (no display)."""

from __future__ import annotations

from pathlib import Path
from typing import Sequence

import numpy as np

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402


def plot_hist(
    arrays: Sequence[np.ndarray],
    title: str = "",
    labels: Sequence[str] | None = None,
    xlabel: str = "",
    bins: int = 100,
    percentiles: tuple = (),
    min_lim: float | None = None,
    max_lim: float | None = None,
    save_path: str | Path | None = None,
):
    """Overlaid histograms + optional percentile vlines (reference
    plot_hist semantics)."""
    fig, ax = plt.subplots(figsize=(8, 5))
    # limits RESTRICT the binning range (out-of-range mass is dropped) and
    # percentiles come from the RAW series — the reference passes plt_range
    # to hist and quantiles the unclipped data; clipping would pile mass
    # into edge bins and report out-of-range quantiles at the clip bound
    rng = None
    if min_lim is not None or max_lim is not None:
        lo = min_lim if min_lim is not None else min(
            float(np.asarray(a).min()) for a in arrays)
        hi = max_lim if max_lim is not None else max(
            float(np.asarray(a).max()) for a in arrays)
        rng = (lo, hi)
    for i, arr in enumerate(arrays):
        arr = np.asarray(arr).ravel()
        label = labels[i] if labels else None
        ax.hist(arr, bins=bins, range=rng, alpha=0.5, density=True, label=label)
        for p in percentiles:
            ax.axvline(np.quantile(arr, p), linestyle="--", linewidth=0.8)
    ax.set_title(title)
    ax.set_xlabel(xlabel)
    if labels:
        ax.legend()
    if save_path:
        fig.savefig(save_path, dpi=100, bbox_inches="tight")
    plt.close(fig)
    return save_path


def plot_graph(
    values: Sequence[float],
    steps: Sequence[int] | None = None,
    title: str = "",
    ylabel: str = "",
    save_path: str | Path | None = None,
):
    """Metric curve annotated with min and last values (the reference's FID
    curve plot, tracker.py:330-341)."""
    values = np.asarray(values, float)
    steps = np.arange(len(values)) if steps is None else np.asarray(steps)
    fig, ax = plt.subplots(figsize=(8, 5))
    ax.plot(steps, values)
    i_min = int(np.argmin(values))
    ax.annotate(f"min {values[i_min]:.3f}", (steps[i_min], values[i_min]),
                textcoords="offset points", xytext=(5, 5))
    ax.annotate(f"last {values[-1]:.3f}", (steps[-1], values[-1]),
                textcoords="offset points", xytext=(5, -10))
    ax.set_title(title)
    ax.set_ylabel(ylabel)
    if save_path:
        fig.savefig(save_path, dpi=100, bbox_inches="tight")
    plt.close(fig)
    return save_path


def plot_bar(
    heights: Sequence[float],
    labels: Sequence[str],
    title: str = "",
    save_path: str | Path | None = None,
):
    fig, ax = plt.subplots(figsize=(8, 5))
    ax.bar(range(len(heights)), heights)
    ax.set_xticks(range(len(labels)))
    ax.set_xticklabels(labels, rotation=45, ha="right")
    ax.set_title(title)
    if save_path:
        fig.savefig(save_path, dpi=100, bbox_inches="tight")
    plt.close(fig)
    return save_path


def plot_error_bar(
    means: Sequence[float],
    stds: Sequence[float],
    labels: Sequence[str],
    title: str = "",
    ylabel: str = "",
    save_path: str | Path | None = None,
):
    """Mean +/- std error-bar plot (reference
    evaluation/gan_evaluation/error_bar_plot.py)."""
    fig, ax = plt.subplots(figsize=(8, 5))
    x = np.arange(len(means))
    ax.errorbar(x, means, yerr=stds, fmt="o", capsize=4)
    ax.set_xticks(x)
    ax.set_xticklabels(labels, rotation=45, ha="right")
    ax.set_title(title)
    ax.set_ylabel(ylabel)
    if save_path:
        fig.savefig(save_path, dpi=100, bbox_inches="tight")
    plt.close(fig)
    return save_path
