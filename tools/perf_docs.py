"""Regenerate the performance sections of README.md and STATUS.md from
the official driver-captured ``BENCH_r*.json`` record.

One source of perf truth (VERDICT r03 item 2, r04 item 2): prose must
never assert a number the driver artifact contradicts.  This script
renders the marker-delimited blocks

    <!-- PERF:BEGIN ... -->
    ...
    <!-- PERF:END -->

in README.md and STATUS.md from the newest ``BENCH_rNN.json`` (or an
explicit path), so the documents cannot diverge from the record.  Any
non-driver measurement (judge idle-chip re-runs, builder-session
numbers) appears only inside ``previous`` context and is always
labelled not-official.

Usage::

    python tools/perf_docs.py            # newest BENCH_r*.json
    python tools/perf_docs.py BENCH_r05.json
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

BEGIN_RE = re.compile(r"<!-- PERF:BEGIN[^>]*-->")
END = "<!-- PERF:END -->"


def newest_bench() -> str:
    """Newest driver record: the highest-numbered ``BENCH_rNN.json``, or
    ``BENCH_LATEST.json`` when it is more recent (``bench.py`` writes it
    at the end of every run and regenerates the doc blocks from it, so
    the docs track the newest capture even before the driver's record
    file is committed)."""
    paths = sorted(glob.glob(os.path.join(ROOT, "BENCH_r*.json")))
    latest = os.path.join(ROOT, "BENCH_LATEST.json")
    if os.path.exists(latest) and (
        not paths or os.path.getmtime(latest) >= os.path.getmtime(paths[-1])
    ):
        return latest
    if not paths:
        raise SystemExit("no BENCH_r*.json found")
    return paths[-1]


def load(path: str) -> dict:
    """The driver wraps the record as {n, cmd, rc, tail, parsed}; a raw
    bench.py capture is one JSON line per completed config with the LAST
    line the complete record.  Accept both."""
    with open(path) as f:
        text = f.read()
    try:
        wrapper = json.loads(text)
        if isinstance(wrapper, dict) and "parsed" in wrapper:
            return wrapper["parsed"]
        if isinstance(wrapper, dict) and "configs" in wrapper:
            return wrapper
    except json.JSONDecodeError:
        pass
    lines = [ln for ln in text.splitlines() if ln.strip()]
    return json.loads(lines[-1])


def fmt_cells(v) -> str:
    if v is None:
        return "—"
    if v >= 1e6:
        return f"{v / 1e6:.2f}M"
    if v >= 1e3:
        return f"{v / 1e3:.1f}k"
    return f"{v:.0f}"


def fmt_pct(v) -> str:
    return f"{100 * v:.1f}%" if v is not None else "—"


def entry_row(name: str, entry: dict, description: str) -> str | None:
    if not entry or "error" in entry or "skipped" in entry:
        status = entry.get("error") or entry.get("skipped") or "missing"
        return f"| {description} | — ({status}) | | |"
    cells = entry.get("cells_per_sec")
    ms = entry.get("ms_per_step")
    mfu = entry.get("mfu")
    detail = []
    if ms is not None:
        detail.append(f"{ms:.3f} ms/step")
    if entry.get("batch"):
        detail.append(f"B={entry['batch']}")
    if mfu is not None:
        detail.append(f"MFU {fmt_pct(mfu)}")
    if entry.get("wire_reduction"):
        detail.append(f"wire ÷{entry['wire_reduction']}")
    quality = ""
    if "quality_ok" in entry:
        quality = "ok" if entry["quality_ok"] else (
            f"⚠ dispersion {entry.get('rep_dispersion')}, "
            f"floor {entry.get('dispatch_fetch_floor_ms')} ms"
        )
    prev = entry.get("previous") or {}
    prev_txt = ", ".join(
        f"{k.replace('_', ' ')}: {fmt_cells(v)}"
        for k, v in prev.items()
    )
    return (
        f"| {description} | **{fmt_cells(cells)} cells/s** "
        f"({', '.join(detail)}) | {quality} | {prev_txt} |"
    )


def source_label(src: str) -> str:
    if src == "BENCH_LATEST.json":
        return (
            "**Record: `BENCH_LATEST.json`** — written by `bench.py` at "
            "the end of its most recent run and regenerated into this "
            "block automatically.  The driver's end-of-round run "
            "overwrites it, at which point this block IS the official "
            "record; a builder-session run in between is labelled by its "
            "own capture here and is not official until then."
        )
    return (
        f"**Official record: `{src}`** (driver-captured; every number "
        "below is from that artifact — regenerate this block with "
        "`python tools/perf_docs.py` after each driver capture)."
    )


LEGS = [
    ("vae_nb", "VAE-NB training (headline, 68k×2048)"),
    ("vae_nb_large_batch", "VAE-NB large batch (best of 4096/8192)"),
    ("vae_zinb_cat", "VAE ZINB + categorised (K=10)"),
    ("gmvae_nb", "GMVAE-NB (K=10, best of batch sweep)"),
    ("iw_evaluation", "IW-ELBO (R=8) evaluation"),
    ("million_device_train", "1M-cell device-resident training"),
    ("million_iw_eval", "1M-cell IW-ELBO (R=8) evaluation"),
    ("million_latent", "1M-cell latent extraction"),
    ("streaming_csr", "Streaming epoch, CSR wire (host-link-bound)"),
]


def render_status(record: dict, src: str) -> str:
    lines = [
        f"<!-- PERF:BEGIN generated by tools/perf_docs.py from {src} — "
        "do not hand-edit -->",
        "",
        source_label(src)
        + f"  Device: {record.get('device_kind', '?')}.  "
        "`previous` columns give context only: driver records of earlier "
        "rounds and non-official idle-chip/builder re-measurements.",
        "",
        "| Config | Official | Measurement quality | Previous (context) |",
        "|---|---|---|---|",
    ]
    configs = record.get("configs", {})
    for key, description in LEGS:
        row = entry_row(key, configs.get(key, {}), description)
        if row:
            lines.append(row)
    ari = configs.get("gmvae_ari", {})
    if "adjusted_rand_index" in ari:
        lines.append(
            f"| GMVAE development ARI (CI-gate config) | "
            f"**{ari['adjusted_rand_index']}** "
            f"({ari.get('epochs_trained', '?')} epochs; known-good "
            f"{ari.get('known_good')}, floor {ari.get('gate_floor')}) | | "
            f"r04 driver: {ari.get('previous', {}).get('r04_driver', '—')} |"
        )
    harness = record.get("harness", {})
    if harness:
        lines += [
            "",
            "Contention defence: slope reps must agree within "
            f"{harness.get('dispersion_bound', 0.05):.0%} and the dispatch "
            f"floor must stay under {harness.get('floor_bound_ms')} ms, "
            "else the leg retries within budget and is flagged; a flagged "
            "headline re-measures at the end of the run.",
        ]
    lines += ["", END]
    return "\n".join(lines)


def render_readme(record: dict, src: str) -> str:
    configs = record.get("configs", {})
    v = configs.get("vae_nb", {})
    million = configs.get("million_device_train", {})
    parts = [
        f"<!-- PERF:BEGIN generated by tools/perf_docs.py from {src} — "
        "do not hand-edit -->",
        f"  Newest captured record (`{src}`): "
        f"**{fmt_cells(v.get('cells_per_sec'))} cells/s/chip** "
        f"({v.get('ms_per_step', '?')} ms/step, MFU "
        f"{fmt_pct(v.get('mfu'))}) on VAE-NB training on one "
        f"{record.get('device_kind', 'TPU')} chip — 68k×2048 via "
        "`bench.py` (slope-timed steady state, contention-checked)"
    ]
    extras = []
    lb = configs.get("vae_nb_large_batch", {})
    if lb.get("cells_per_sec"):
        extras.append(
            f"**{fmt_cells(lb['cells_per_sec'])} cells/s** at "
            f"B={lb.get('batch')}"
        )
    if million.get("cells_per_sec"):
        extras.append(
            f"a 1M-cell × 2048-gene device-resident epoch at "
            f"**{fmt_cells(million['cells_per_sec'])} cells/s**"
        )
    if extras:
        parts[-1] += "; " + " and ".join(extras)
    parts[-1] += (
        ".  This block regenerates from the newest bench capture "
        "(`bench.py` rewrites it after every run — the driver's "
        "end-of-round capture is the official one); regenerate this "
        "block with `python tools/perf_docs.py` after each driver "
        "capture."
    )
    parts.append(END)
    return "\n".join(parts)


def splice(path: str, block: str) -> None:
    with open(path) as f:
        text = f.read()
    m = BEGIN_RE.search(text)
    if not m or END not in text:
        raise SystemExit(f"{path}: PERF markers not found")
    start = m.start()
    end = text.index(END) + len(END)
    with open(path, "w") as f:
        f.write(text[:start] + block + text[end:])
    print(f"updated {path}")


def main() -> None:
    src_path = sys.argv[1] if len(sys.argv) > 1 else newest_bench()
    record = load(src_path)
    src = os.path.basename(src_path)
    splice(os.path.join(ROOT, "STATUS.md"), render_status(record, src))
    splice(os.path.join(ROOT, "README.md"), render_readme(record, src))


if __name__ == "__main__":
    main()
