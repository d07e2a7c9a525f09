"""Cross-model comparison: aggregate metric/prediction pickles from many
runs into comparison tables and figures.

Counterpart of ``scvae/analyses/cross_analysis.py`` (2111 LoC): walks an
analyses directory tree for ``test-metrics*.pkl.gz`` /
``test-prediction*.pkl.gz`` (the artifacts :func:`analyse_results`
writes), filters by include/exclude strings (``cross_analysis.py:1872``),
drops runs trained past ``epoch_cut_off`` (``:1585``), and produces:

* a comparison table (ELBO/ENRE/KL + clustering metrics per model
  variant) + CSV + optional summary log (``:259-1288``),
* ELBO-vs-ARI correlation scatters grouped by model type
  (``figures/cross_model.py:64-88``),
* an ELBO heat map over (reconstruction distribution × latent size)
  when the run grid spans both axes (``figures/cross_model.py:26-61``),
* per-metric model plots grouped by differentiators
  (``figures/cross_model.py:91-330``).

Model specifications are parsed from the hyperparameter-addressed run
directory layout produced by :mod:`scvae_tpu.models.naming` (the
reference parses its equivalent ``name`` scheme at
``cross_analysis.py:1531-1869``).
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
                    ).append((filename, pickle.load(f)))
    return found


def _match_string(name, included_strings=None, excluded_strings=None) -> bool:
    """Reference ``cross_analysis.py:1872-1890``."""
    for s in included_strings or []:
        if s not in name:
            return False
    for s in excluded_strings or []:
        if s in name:
            return False
    return True


def _filter_runs(
    runs: dict[str, Any],
    data_set_included_strings=None,
    data_set_excluded_strings=None,
    model_included_strings=None,
    model_excluded_strings=None,
) -> dict[str, Any]:
    return {
        name: value
        for name, value in runs.items()
        if _match_string(name, data_set_included_strings, data_set_excluded_strings)
        and _match_string(name, model_included_strings, model_excluded_strings)
    }


_MODEL_TYPES = ("GMVAE", "VAE")


def _parse_model_specifications(name: str) -> dict[str, Any]:
    """Extract comparison axes from a run's relative path.

    The path embeds the hyperparameter-addressed model name
    (:func:`scvae_tpu.models.naming.model_name`):
    ``…/<TYPE>/<latent>[-c_K][-p_m]…/<reconstruction>[-k_K]-l_D-h_…/…``.
    """
    parts = name.split(os.sep)
    spec: dict[str, Any] = {
        "model type": None,
        "latent distribution": None,
        "clusters": None,
        "reconstruction distribution": None,
        "latent size": None,
        "run": None,
        "version": None,
    }
    type_index = None
    for i, part in enumerate(parts):
        if part in _MODEL_TYPES:
            spec["model type"] = part
            type_index = i
            break
    # Distribution names normalise to single underscore-joined tokens
    # (normalise_string maps spaces AND dashes to "_"), so the major/minor
    # directory names are "-"-joined marker lists with the distribution as
    # the first token.
    if type_index is not None and type_index + 1 < len(parts):
        tokens = parts[type_index + 1].split("-")
        spec["latent distribution"] = tokens[0] or None
        for token in tokens[1:]:
            if re.fullmatch(r"c_\d+", token):
                spec["clusters"] = int(token[2:])
    if type_index is not None and type_index + 2 < len(parts):
        tokens = parts[type_index + 2].split("-")
        spec["reconstruction distribution"] = tokens[0] or None
        for token in tokens[1:]:
            if re.fullmatch(r"l_\d+", token):
                spec["latent size"] = int(token[2:])
    for part in parts:
        if part.startswith("run_"):
            spec["run"] = part[4:]
        elif part in ("best", "early_stopping", "end_of_training"):
            spec["version"] = part
    return spec


def _extract_row(
    name: str,
    run: dict[str, Any],
    prediction_included_strings=None,
    prediction_excluded_strings=None,
) -> dict[str, Any]:
    row: dict[str, Any] = {"model": name}
    row.update(_parse_model_specifications(name))
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
    for filename, prediction in run.get("predictions", []) or []:
        if not _match_string(
            filename, prediction_included_strings, prediction_excluded_strings
        ):
            continue
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


_SPEC_COLUMNS = (
    "model type",
    "latent distribution",
    "clusters",
    "reconstruction distribution",
    "latent size",
    "run",
    "version",
)


def _cross_model_figures(table: pd.DataFrame, directory: str) -> list[str]:
    """Correlation scatters, ELBO heat map, and per-metric model plots."""
    from scvae_tpu.analyses import figures

    paths: list[str] = []
    records = table.reset_index().to_dict("records")

    # ELBO-vs-ARI correlations grouped by model type.
    if "ARI" in table.columns and "ELBO" in table.columns:
        correlation_sets: dict[str, dict[str, list[float]]] = {}
        for record in records:
            if pd.isna(record.get("ARI")) or pd.isna(record.get("ELBO")):
                continue
            group = str(record.get("model type") or "model")
            entry = correlation_sets.setdefault(group, {"ELBO": [], "ARI": []})
            entry["ELBO"].append(float(record["ELBO"]))
            entry["ARI"].append(float(record["ARI"]))
        if any(s["ELBO"] for s in correlation_sets.values()):
            paths.append(
                figures.plot_correlations(
                    correlation_sets,
                    "ELBO",
                    "ARI",
                    x_label="ELBO",
                    y_label="Adjusted Rand index",
                    directory=directory,
                )
            )
            paths.append(
                figures.plot_model_metric_sets(
                    records,
                    "ELBO",
                    "ARI",
                    x_label="ELBO",
                    y_label="Adjusted Rand index",
                    primary_differentiator_key="model type",
                    directory=directory,
                )
            )

    # ELBO heat map over reconstruction distribution × latent size when the
    # run grid spans both axes.
    if "ELBO" in table.columns:
        grid = pd.DataFrame(records).dropna(
            subset=["reconstruction distribution", "latent size", "ELBO"]
        )
        if (
            len(grid)
            and grid["reconstruction distribution"].nunique() > 1
            and grid["latent size"].nunique() > 1
        ):
            pivot = grid.pivot_table(
                index="reconstruction distribution",
                columns="latent size",
                values="ELBO",
                aggfunc="max",
            )
            paths.append(
                figures.plot_elbo_heat_map(
                    pivot,
                    x_label="Latent size",
                    y_label="Reconstruction distribution",
                    z_label="ELBO",
                    directory=directory,
                )
            )

    # Per-metric plots grouped by model type / reconstruction distribution.
    for metric, label in (("ELBO", "ELBO"), ("ARI", "Adjusted Rand index")):
        if metric in table.columns and table[metric].notna().sum():
            paths.append(
                figures.plot_model_metrics(
                    records,
                    metric,
                    label=label,
                    primary_differentiator_key="model type",
                    secondary_differentiator_key="reconstruction distribution",
                    name=f"model_metrics-{metric}",
                    directory=directory,
                )
            )
    return paths


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
    table; writes CSV, figures (+ optional log) into
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

    rows = [
        _extract_row(
            name,
            run,
            prediction_included_strings,
            prediction_excluded_strings,
        )
        for name, run in sorted(runs.items())
    ]
    if epoch_cut_off:
        # Skip runs trained longer than the cut-off (reference :1585).
        rows = [
            row
            for row in rows
            if row.get("epochs") is None or row["epochs"] <= epoch_cut_off
        ]
        if not rows:
            print("No runs within the epoch cut-off.")
            return pd.DataFrame()
    table = pd.DataFrame(rows).set_index("model")
    if "ELBO" in table.columns:
        table = table.sort_values("ELBO", ascending=False)

    os.makedirs(cross_analysis_directory, exist_ok=True)
    csv_path = os.path.join(cross_analysis_directory, "comparison.csv")
    table.to_csv(csv_path)
    # Readable summary omits the parsed-specification columns.
    display = table.drop(
        columns=[c for c in _SPEC_COLUMNS if c in table.columns]
    )
    print(display.to_string())

    if log_summary:
        with open(
            os.path.join(cross_analysis_directory, "summary.log"), "w"
        ) as f:
            f.write(display.to_string() + "\n")

    try:
        _cross_model_figures(table, cross_analysis_directory)
    except Exception as error:  # figures must never break the aggregation
        print(f"Cross-model figures failed: {error}")

    # Comparison bar figure: ELBO (and ARI when present) per model.
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        metrics_to_plot = [m for m in ("ELBO", "ARI") if m in table.columns]
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
