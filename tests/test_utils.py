"""Unit tests for string/duration utilities (reference-parity behaviour)."""

from scvae_tpu.utils import (
    capitalise_string,
    enumerate_strings,
    format_duration,
    normalise_string,
    proper_string,
)


def test_normalise_string():
    assert normalise_string("Negative Binomial") == "negative_binomial"
    assert normalise_string("zero-inflated poisson") == "zero_inflated_poisson"
    assert normalise_string("10x (PBMC)") == "10x_pbmc"


def test_proper_string():
    translation = {"negative binomial": ["negative_binomial", "nb"]}
    assert proper_string("NB", translation) == "negative binomial"
    assert proper_string("Negative-Binomial", translation) == "negative binomial"
    assert proper_string("unknown", translation) == "unknown"


def test_format_duration():
    assert format_duration(0.0001) == "<1 ms"
    assert format_duration(0.5) == "500 ms"
    assert format_duration(5.0) == "5 s"
    assert format_duration(65) == "1m 5s"
    assert format_duration(3671) == "1h 1m 11s"


def test_capitalise_string():
    assert capitalise_string("hello world") == "Hello world"
    assert capitalise_string("ARI score") == "ARI score"


def test_enumerate_strings():
    assert enumerate_strings(["a"]) == "a"
    assert enumerate_strings(["a", "b"]) == "a and b"
    assert enumerate_strings(["a", "b", "c"], conjunction="or") == "a, b, or c"


class TestTraceSummary:
    def test_summarize_trace_parses_chrome_trace(self, tmp_path):
        import gzip
        import json
        import os

        from scvae_tpu.utils.profiling import summarize_trace

        plugin = tmp_path / "plugins" / "profile" / "run1"
        os.makedirs(plugin)
        events = {
            "traceEvents": [
                {"ph": "X", "name": "fusion.1", "dur": 1500},
                {"ph": "X", "name": "fusion.1", "dur": 500},
                {"ph": "X", "name": "custom-call.2", "dur": 3000},
                {"ph": "M", "name": "process_name", "args": {}},
            ]
        }
        with gzip.open(plugin / "host.trace.json.gz", "wt") as f:
            json.dump(events, f)
        out = summarize_trace(str(tmp_path), top=5)
        assert out[0]["name"] == "custom-call.2"
        assert out[0]["total_ms"] == 3.0
        assert out[1] == {"name": "fusion.1", "total_ms": 2.0, "count": 2}

    def test_summarize_trace_missing(self, tmp_path):
        import pytest

        from scvae_tpu.utils.profiling import summarize_trace

        with pytest.raises(FileNotFoundError):
            summarize_trace(str(tmp_path))
