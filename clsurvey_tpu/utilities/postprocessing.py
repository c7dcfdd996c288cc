"""Result postprocessing — summary metrics + plot data collection.

Consumes the eval result dicts written by framework/evaluate.py
(``test_method_performances<eval_name><i>.pth`` with
``{eval_name: {seq_res, seq_forgetting, seq_head_acc}}``) — the same shapes
the reference's pipeline reads (ref:src/utilities/main_postprocessing.py:
12-41,261-360) — and produces:

- per-method final-model average accuracy and average forgetting (the
  survey's summary table, ref:main_postprocessing.py:175-187);
- per-ref-task accuracy curves for the horizontally-stacked plots
  (utilities/plot.py).
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

import numpy as np

from clsurvey_tpu.utils import io

METHOD_COLORS = {
    # per-method plot colors (family-grouped like the reference,
    # ref:main_postprocessing.py:83-152)
    "SI": "tab:blue", "EWC": "tab:cyan", "MAS": "tab:purple",
    "mean_IMM": "navy", "mode_IMM": "royalblue",
    "LWF": "tab:green", "EBLL": "darkgreen",
    "GEM": "tab:red", "ICARL": "firebrick",
    "packnet": "tab:orange", "HAT": "gold", "pathnet": "peru",
    "finetuning": "gray", "joint": "black",
    "finetuning_rehearsal_partial_mem": "silver",
    "finetuning_rehearsal_full_mem": "dimgray",
}


@dataclass
class ExperimentDataEntry:
    """One curve/table row (ref:main_postprocessing.py:44-172)."""

    dataset_name: str
    eval_name: str
    model_name: str
    gridsearch_name: str
    exp_name: str
    results_dir: str
    label: str = ""
    color: str = "tab:gray"
    # filled by collect():
    seq_acc: dict = field(default_factory=dict)        # ref task -> [acc..]
    seq_forgetting: dict = field(default_factory=dict)
    task_count: int = 0
    # filled by collect_hyperparams(): key -> [value per task]
    hyperparams: dict = field(default_factory=dict)

    def __post_init__(self):
        if not self.label:
            self.label = self.eval_name
        self.color = METHOD_COLORS.get(self.eval_name, self.color)

    # --- metrics (ref:main_postprocessing.py:342-360) -----------------------
    @property
    def final_model_accs(self) -> list:
        """Accuracy of the FINAL model on each ref task."""
        return [self.seq_acc[t][-1] for t in sorted(self.seq_acc)]

    @property
    def avg_acc(self) -> float:
        accs = self.final_model_accs
        return float(np.mean(accs)) if accs else float("nan")

    @property
    def avg_forgetting(self) -> float:
        """Mean over tasks of first-model-acc minus final-model-acc; tasks
        with a single model (no later training) contribute 0
        (ref:main_postprocessing.py:354-358; the reference's
        seq_forgetting lists omit the self-comparison entry)."""
        f = [(self.seq_forgetting[t][-1] if self.seq_forgetting[t] else 0.0)
             for t in sorted(self.seq_forgetting)]
        return float(np.mean(f)) if f else float("nan")


def collect(entry: ExperimentDataEntry, max_task_count: int | None = None
            ) -> ExperimentDataEntry:
    """Load the per-ref-task result dicts for one experiment."""
    t = 1
    while True:
        path = os.path.join(
            entry.results_dir,
            f"test_method_performances{entry.eval_name}{t}.pth")
        if not io.exists(path) or (max_task_count and t > max_task_count):
            break
        res = io.load(path)[entry.eval_name]
        entry.seq_acc[t] = list(res["seq_res"])
        entry.seq_forgetting[t] = list(res.get("seq_forgetting", []))
        t += 1
    entry.task_count = t - 1
    return entry


def collect_gridsearch_exp_entries(test_results_root_path: str,
                                   ds_name: str, eval_name: str,
                                   model_name: str, gridsearch_name: str,
                                   exp_name_contains: str | None = None,
                                   label_prefix: str = "") -> list:
    """Scan a gridsearch's test-results tree for experiments
    (ref:main_postprocessing.py:190-258)."""
    parent = os.path.join(test_results_root_path, "results", ds_name,
                          eval_name, model_name, gridsearch_name)
    entries = []
    if not os.path.isdir(parent):
        return entries
    for exp_name in sorted(os.listdir(parent)):
        if exp_name_contains and exp_name_contains not in exp_name:
            continue
        exp_dir = os.path.join(parent, exp_name)
        if not os.path.isdir(exp_dir):
            continue
        entry = ExperimentDataEntry(
            ds_name, eval_name, model_name, gridsearch_name, exp_name,
            exp_dir, label=(label_prefix + eval_name if label_prefix
                            else eval_name))
        entries.append(collect(entry))
    return [e for e in entries if e.task_count > 0]


def collect_hyperparams(entry: ExperimentDataEntry, method_name: str,
                        hyperparams_selection: list | None = None,
                        hyperparams_counts: dict | None = None) -> dict:
    """Per-task converged hyperparameters from the TRAIN results tree
    (``task_N/TASK_TRAINING/hyperparams.pth.tar``,
    ref:main_postprocessing.py:318-338 + collect_hyperparams :373-392).
    Returns the shared ``hyperparams_counts`` used for table padding."""
    from clsurvey_tpu.utils import paths as paths_lib

    counts = hyperparams_counts if hyperparams_counts is not None else {}
    for task in range(1, max(entry.task_count, 1) + 1):
        path = os.path.join(
            paths_lib.get_train_results_path(
                entry.dataset_name, method_name, entry.model_name,
                entry.gridsearch_name, entry.exp_name, task_counter=task,
                create=False),
            "TASK_TRAINING", "hyperparams.pth.tar")
        if not io.exists(path):
            continue
        try:
            hdict = io.load(path)
        except Exception:
            continue
        # the converged values live in state.hyperparams; flatten them plus
        # the top-level scalars, like the reference's key iteration
        flat = {k: v for k, v in hdict.items()
                if not isinstance(v, dict)}
        flat.update(hdict.get("state", {}).get("hyperparams", {}))
        keys = hyperparams_selection or list(flat.keys())
        for key in keys:
            if key not in flat:
                continue
            entry.hyperparams.setdefault(key, []).append(flat[key])
            counts[key] = max(counts.get(key, 0),
                              len(entry.hyperparams[key]))
    return counts


def pad_hyperparams(entries: list, hyperparams_counts: dict,
                    pad_value=0) -> None:
    """Pad per-entry hyperparam lists to the max count so they tabulate
    (ref:main_postprocessing.py:395-404 pad_dataframe)."""
    for key, count in hyperparams_counts.items():
        for e in entries:
            vals = e.hyperparams.setdefault(key, [])
            vals.extend([pad_value] * (count - len(vals)))


def print_hyperparam_table(entries: list, table_sep: str = "\t") -> str:
    """Per-method converged-hyperparameter table (the reference renders
    this as a dataframe next to the summary,
    ref:main_postprocessing.py:405-433)."""
    keys = sorted({k for e in entries for k in e.hyperparams})
    lines = [table_sep.join(["method", "exp"] + keys)]
    for e in entries:
        row = [e.eval_name, e.exp_name]
        for k in keys:
            vals = e.hyperparams.get(k, [])
            row.append(",".join(
                f"{v:.4g}" if isinstance(v, float) else str(v)
                for v in vals))
        lines.append(table_sep.join(row))
    table = "\n".join(lines)
    print(table)
    return table


def print_exp_statistics(entries: list, table_sep: str = "\t") -> str:
    """Summary table: avg acc / avg forgetting of the final model
    (ref:main_postprocessing.py:175-187)."""
    lines = [table_sep.join(["method", "exp", "avg_acc", "avg_forgetting"])]
    for e in entries:
        lines.append(table_sep.join([
            e.eval_name, e.exp_name, f"{e.avg_acc:.2f}",
            f"{e.avg_forgetting:.2f}"]))
    table = "\n".join(lines)
    print(table)
    return table


def analyze_experiments(entries: list, plot_seq_acc: bool = True,
                        plot_seq_forgetting: bool = False,
                        save_img_path: str | None = None,
                        img_extention: str = "png",
                        ylim=None) -> str:
    """Pipeline: collect -> plot -> summary (ref:main_postprocessing.py:
    12-41)."""
    if save_img_path and entries:
        from clsurvey_tpu.utilities import plot as plot_lib

        os.makedirs(os.path.dirname(save_img_path) or ".", exist_ok=True)
        if plot_seq_acc:
            plot_lib.plot_line_horizontal_sequence(
                entries, save_img_path + "_acc." + img_extention,
                metric="acc", ylim=ylim)
        if plot_seq_forgetting:
            plot_lib.plot_line_horizontal_sequence(
                entries, save_img_path + "_forgetting." + img_extention,
                metric="forgetting", ylim=ylim)
    return print_exp_statistics(entries)
