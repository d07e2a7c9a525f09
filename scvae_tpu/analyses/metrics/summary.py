"""Summary statistics table (mean/std/dispersion/min/max/sparsity).

Counterpart of ``scvae/analyses/metrics/summary.py:27-93``.
"""

from __future__ import annotations

import numpy as np
import scipy.sparse

from scvae_tpu.data.sparse import sparsity as _sparsity


def summary_statistics(x, name: str = "", tolerance: float = 1e-3,
                       skip_sparsity: bool = False) -> dict:
    if scipy.sparse.issparse(x):
        mean = x.mean()
        n = x.shape[0] * x.shape[1]
        sum_sq = float((np.asarray(x.data, np.float64) ** 2).sum())
        var = (sum_sq - n * mean**2) / (n - 1)
        std = float(np.sqrt(max(var, 0.0)))
        x_min = float(x.data.min()) if x.nnz else 0.0
        x_min = min(x_min, 0.0) if x.nnz < n else x_min
        x_max = float(x.data.max()) if x.nnz else 0.0
        x_sparsity = np.nan if skip_sparsity else _sparsity(x)
    else:
        x = np.asarray(x)
        mean = float(x.mean())
        std = float(x.std(ddof=1))
        x_min = float(x.min())
        x_max = float(x.max())
        if skip_sparsity:
            x_sparsity = np.nan
        else:
            x_sparsity = float((np.abs(x) <= tolerance).sum() / x.size)
    dispersion = std**2 / mean if mean else np.nan
    return {
        "name": name,
        "mean": float(mean),
        "standard deviation": std,
        "minimum": x_min,
        "maximum": x_max,
        "dispersion": float(dispersion),
        "sparsity": float(x_sparsity),
    }


def format_summary_statistics(statistics_sets, name: str = "Data set") -> str:
    if not isinstance(statistics_sets, list):
        statistics_sets = [statistics_sets]
    name_width = max(
        [len(name)] + [len(s["name"]) for s in statistics_sets]
    )
    heading = "  ".join([
        "{:{}}".format(name, name_width),
        " mean ", "std. dev. ", "dispersion",
        " minimum ", " maximum ", "sparsity",
    ])
    rows = [heading]
    for s in statistics_sets:
        rows.append("  ".join([
            "{:{}}".format(s["name"], name_width),
            "{:<9.5g}".format(s["mean"]),
            "{:<9.5g}".format(s["standard deviation"]),
            "{:<9.5g}".format(s["dispersion"]),
            "{:<11.5g}".format(s["minimum"]),
            "{:<11.5g}".format(s["maximum"]),
            "{:<7.5g}".format(s["sparsity"]),
        ]))
    return "\n".join(rows)
