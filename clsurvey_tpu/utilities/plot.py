"""Horizontally-stacked per-task accuracy curves
(ref:src/utilities/plot.py:10-246 ``plot_line_horizontal_sequence``).

One subplot per reference task; each method contributes a curve of that
task's accuracy as later models are trained (x = training step in the task
sequence)."""

from __future__ import annotations

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402


def plot_line_horizontal_sequence(entries, save_img_path: str,
                                  metric: str = "acc", ylim=None,
                                  figsize_per_task: float = 2.6):
    task_count = max(e.task_count for e in entries)
    fig, axes = plt.subplots(
        1, task_count, sharey=True,
        figsize=(figsize_per_task * task_count, 3.2))
    if task_count == 1:
        axes = [axes]
    for ref_task in range(1, task_count + 1):
        ax = axes[ref_task - 1]
        for e in entries:
            data = (e.seq_acc if metric == "acc"
                    else e.seq_forgetting).get(ref_task)
            if not data:
                continue
            x = list(range(ref_task, ref_task + len(data)))
            ax.plot(x, data, label=e.label, color=e.color, marker="o",
                    markersize=3, linewidth=1.2)
        ax.set_title(f"Task {ref_task}")
        ax.set_xlabel("trained task")
        ax.set_xticks(list(range(ref_task, task_count + 1)))
        if ylim:
            ax.set_ylim(*ylim)
        ax.grid(alpha=0.3)
    axes[0].set_ylabel("accuracy (%)" if metric == "acc"
                       else "forgetting (%)")
    handles, labels = axes[0].get_legend_handles_labels()
    if not handles:
        for ax in axes:
            handles, labels = ax.get_legend_handles_labels()
            if handles:
                break
    fig.legend(handles, labels, loc="upper center",
               ncol=min(len(labels), 6), frameon=False)
    fig.tight_layout(rect=(0, 0, 1, 0.9))
    fig.savefig(save_img_path, dpi=150)
    plt.close(fig)
    return save_img_path
