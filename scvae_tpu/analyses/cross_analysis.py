"""Cross-model comparison: aggregate metric/prediction pickles from many
runs into comparison tables and figures.

Compact counterpart of ``scvae/analyses/cross_analysis.py`` (2111 LoC):
walks an analyses directory tree for ``test-metrics*.pkl.gz`` /
``test-prediction*.pkl.gz`` (the artifacts :func:`analyse_results`
writes), filters by include/exclude strings, and produces a comparison
table (ELBO/ENRE/KL + clustering metrics per model variant), a CSV export,
a comparison plot, and an optional summary log.
"""

from __future__ import annotations

import gzip
import os
import pickle
import re
from typing import Any

import numpy as np
import pandas as pd

from scvae_tpu.defaults import get_default


def _metrics_sets_in_analyses_directory(
    analyses_directory: str,
) -> dict[str, dict[str, Any]]:
    """model-relative-path → {"metrics": dict, "predictions": [dict, …]}
    (reference ``cross_analysis.py:1290-1383``)."""
    found: dict[str, dict[str, Any]] = {}
    for root, _dirs, files in os.walk(analyses_directory):
        rel = os.path.relpath(root, analyses_directory)
        for filename in files:
            path = os.path.join(root, filename)
            if re.fullmatch(r"test-metrics.*\.pkl\.gz", filename):
                with gzip.open(path, "rb") as f:
                    found.setdefault(rel, {})["metrics"] = pickle.load(f)
            elif re.fullmatch(r"test-prediction.*\.pkl\.gz", filename):
                with gzip.open(path, "rb") as f:
                    found.setdefault(rel, {}).setdefault(
                        "predictions", []
                    ).append(pickle.load(f))
    return found


def _filter_runs(
    runs: dict[str, Any],
    data_set_included_strings=None,
    data_set_excluded_strings=None,
    model_included_strings=None,
    model_excluded_strings=None,
) -> dict[str, Any]:
    def keep(name: str) -> bool:
        for strings, want in (
            (data_set_included_strings, True),
            (model_included_strings, True),
        ):
            for s in strings or []:
                if (s in name) != want:
                    return False
        for strings in (data_set_excluded_strings, model_excluded_strings):
            for s in strings or []:
                if s in name:
                    return False
        return True

    return {name: value for name, value in runs.items() if keep(name)}


def _extract_row(name: str, run: dict[str, Any]) -> dict[str, Any]:
    row: dict[str, Any] = {"model": name}
    metrics_dict = run.get("metrics", {})
    evaluation = metrics_dict.get("evaluation", {}) or {}
    for key, label in (
        ("lower_bound", "ELBO"),
        ("reconstruction_error", "ENRE"),
        ("kl_divergence", "KL"),
        ("kl_divergence_z", "KL_z"),
        ("kl_divergence_y", "KL_y"),
    ):
        values = evaluation.get(key)
        if values:
            row[label] = values[-1]
    if metrics_dict.get("accuracy"):
        row["accuracy"] = metrics_dict["accuracy"][-1]
    row["epochs"] = metrics_dict.get("number of epochs trained")

    best_ari = None
    for prediction in run.get("predictions", []) or []:
        clustering = prediction.get("clustering metric values", {})
        ari_values = clustering.get("adjusted Rand index", {}) or {}
        for value in ari_values.values():
            if value is not None and (best_ari is None or value > best_ari):
                best_ari = value
        ami_values = clustering.get("adjusted mutual information", {}) or {}
        for value in ami_values.values():
            if value is not None:
                row.setdefault("AMI", value)
    if best_ari is not None:
        row["ARI"] = best_ari
    return row


def cross_analyse(
    analyses_directory: str,
    data_set_included_strings=None,
    data_set_excluded_strings=None,
    model_included_strings=None,
    model_excluded_strings=None,
    prediction_included_strings=None,
    prediction_excluded_strings=None,
    additional_other_option=None,
    no_prediction_methods_for_gmvae_in_plots: bool = False,
    epoch_cut_off=None,
    export_options=None,
    log_summary: bool | None = None,
    cross_analysis_directory: str | None = None,
) -> pd.DataFrame:
    """Aggregate all runs under ``analyses_directory`` into a comparison
    table; writes CSV (+ optional log + bar figure) into
    ``<analyses_directory>/cross_analysis``."""
    if log_summary is None:
        log_summary = get_default("cross_analysis", "log_summary")
    if cross_analysis_directory is None:
        cross_analysis_directory = os.path.join(
            analyses_directory, "cross_analysis"
        )

    runs = _metrics_sets_in_analyses_directory(analyses_directory)
    runs = _filter_runs(
        runs,
        data_set_included_strings,
        data_set_excluded_strings,
        model_included_strings,
        model_excluded_strings,
    )
    if not runs:
        print("No metrics found to cross-analyse.")
        return pd.DataFrame()

    rows = [_extract_row(name, run) for name, run in sorted(runs.items())]
    table = pd.DataFrame(rows).set_index("model")
    if "ELBO" in table.columns:
        table = table.sort_values("ELBO", ascending=False)

    os.makedirs(cross_analysis_directory, exist_ok=True)
    csv_path = os.path.join(cross_analysis_directory, "comparison.csv")
    table.to_csv(csv_path)
    print(table.to_string())

    if log_summary:
        with open(
            os.path.join(cross_analysis_directory, "summary.log"), "w"
        ) as f:
            f.write(table.to_string() + "\n")

    # comparison figure: ELBO (and ARI when present) per model
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        metrics_to_plot = [
            m for m in ("ELBO", "ARI") if m in table.columns
        ]
        if metrics_to_plot:
            fig, axes = plt.subplots(
                len(metrics_to_plot),
                1,
                figsize=(max(6, 0.45 * len(table)), 3.2 * len(metrics_to_plot)),
                squeeze=False,
            )
            for ax, metric in zip(axes[:, 0], metrics_to_plot):
                ax.bar(np.arange(len(table)), table[metric].astype(float))
                ax.set_xticks(np.arange(len(table)))
                ax.set_xticklabels(table.index, rotation=90, fontsize=6)
                ax.set_ylabel(metric)
            try:
                fig.tight_layout()
            except Exception:
                pass
            fig.savefig(
                os.path.join(cross_analysis_directory, "comparison.png"),
                dpi=150,
                bbox_inches="tight",
            )
            plt.close(fig)
    except Exception as error:
        print(f"Comparison figure failed: {error}")

    return table
