"""One source of perf truth (VERDICT r04 item 2): the PERF blocks in
README.md and STATUS.md must be exactly what ``tools/perf_docs.py``
renders from the newest driver ``BENCH_r*.json`` — hand-edited or stale
perf prose fails CI."""

import os
import sys

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(ROOT, "tools"))

import perf_docs  # noqa: E402


@pytest.fixture(scope="module")
def record():
    path = perf_docs.newest_bench()
    return perf_docs.load(path), os.path.basename(path)


def _block(path):
    with open(path) as f:
        text = f.read()
    m = perf_docs.BEGIN_RE.search(text)
    assert m, f"{path}: PERF:BEGIN marker missing"
    assert perf_docs.END in text, f"{path}: PERF:END marker missing"
    return text[m.start():text.index(perf_docs.END) + len(perf_docs.END)]


def test_status_matches_newest_bench(record):
    rec, src = record
    assert _block(os.path.join(ROOT, "STATUS.md")) == (
        perf_docs.render_status(rec, src)
    ), "STATUS.md perf block is stale — run `python tools/perf_docs.py`"


def test_readme_matches_newest_bench(record):
    rec, src = record
    assert _block(os.path.join(ROOT, "README.md")) == (
        perf_docs.render_readme(rec, src)
    ), "README.md perf block is stale — run `python tools/perf_docs.py`"
