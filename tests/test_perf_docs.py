"""One source of perf truth (VERDICT r04 item 2): the PERF blocks in
README.md and STATUS.md must be exactly what ``tools/perf_docs.py``
renders from the driver ``BENCH_r*.json`` record they claim as their
source — hand-edited or diverging perf prose fails CI.

When a NEWER driver record exists than the one the blocks were
generated from (the driver captures ``BENCH_rNN.json`` after the
round's final commit, so this is expected exactly once per round), the
tests still hard-verify integrity against the claimed source and emit
a warning to run ``python tools/perf_docs.py`` — the next commit must
regenerate."""

import os
import re
import sys
import warnings

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(ROOT, "tools"))

import perf_docs  # noqa: E402

SRC_RE = re.compile(r"from (BENCH_r\d+\.json|BENCH_LATEST\.json)")


def _block_and_source(path):
    with open(path) as f:
        text = f.read()
    m = perf_docs.BEGIN_RE.search(text)
    assert m, f"{path}: PERF:BEGIN marker missing"
    assert perf_docs.END in text, f"{path}: PERF:END marker missing"
    block = text[m.start():text.index(perf_docs.END) + len(perf_docs.END)]
    src = SRC_RE.search(block)
    assert src, f"{path}: PERF block does not name its BENCH source"
    return block, src.group(1)


def _check(doc_name, render):
    block, src = _block_and_source(os.path.join(ROOT, doc_name))
    src_path = os.path.join(ROOT, src)
    assert os.path.exists(src_path), (
        f"{doc_name} claims source {src} which does not exist"
    )
    record = perf_docs.load(src_path)
    assert block == render(record, src), (
        f"{doc_name} perf block diverges from {src} — it was hand-edited "
        "or the renderer changed; run `python tools/perf_docs.py`"
    )
    newest = os.path.basename(perf_docs.newest_bench())
    if newest != src:
        warnings.warn(
            f"{doc_name} perf block was generated from {src} but {newest} "
            "has landed — run `python tools/perf_docs.py` in the next "
            "commit",
            stacklevel=1,
        )


def test_status_matches_its_bench_source():
    _check("STATUS.md", perf_docs.render_status)


def test_readme_matches_its_bench_source():
    _check("README.md", perf_docs.render_readme)


def test_renderer_handles_newest_record():
    """The newest driver record (whatever its round) must render without
    error — so regeneration can never be blocked by a schema surprise."""
    path = perf_docs.newest_bench()
    record = perf_docs.load(path)
    src = os.path.basename(path)
    assert perf_docs.render_status(record, src)
    assert perf_docs.render_readme(record, src)
