"""Generic utilities: string normalisation, durations, terminal output.

Counterpart of the reference's ``scvae/utilities.py`` (behavioural parity
for the string helpers that participate in name resolution and run-directory
layout; reference ``scvae/utilities.py:32-247``).
"""

from scvae_tpu.utils.strings import (
    capitalise_string,
    enumerate_strings,
    format_duration,
    format_time,
    normalise_string,
    proper_string,
)
from scvae_tpu.utils.terminal import heading, subheading, subtitle, title

__all__ = [
    "capitalise_string",
    "enumerate_strings",
    "format_duration",
    "format_time",
    "normalise_string",
    "proper_string",
    "heading",
    "subheading",
    "subtitle",
    "title",
]
