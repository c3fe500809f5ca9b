"""Matrix conformance test: roundtrip EVERY registered static combination.

Mirror of test/matrix_tests.cpp — the de-facto conformance suite. Filters
via env vars MATRIX_PATTERN / MATRIX_EXCLUDE / FAST_MATRIX like the
reference (Documentation.md:356-362). The corpus is a reduced
roundtrip_batch; set MATRIX_FULL_CORPUS=1 for the full border-case corpus.
"""

from __future__ import annotations

import os

import pytest

from tests.util import CORPUS
from tudocomp_tpu.driver import compress, decompress
from tudocomp_tpu.registry_config import compressor_matrix

FAST = os.environ.get("FAST_MATRIX", "0") == "1"
PATTERN = os.environ.get("MATRIX_PATTERN", "")
EXCLUDE = os.environ.get("MATRIX_EXCLUDE", "")

MATRIX = [
    c
    for c in compressor_matrix(fast=FAST)
    if (not PATTERN or PATTERN in c) and (not EXCLUDE or EXCLUDE not in c)
]

if os.environ.get("MATRIX_FULL_CORPUS", "0") == "1":
    TEXTS = CORPUS
else:
    TEXTS = [
        b"",
        b"a",
        b"abcdebcdeabc",
        b"aaaaaaaaa",
        b"foobar\0foobar",
        "ประเทศไทย中华".encode(),
        b"\xff\xfe\xc0 escape pool \xff\0",
    ]


@pytest.mark.parametrize("config", MATRIX)
def test_matrix_roundtrip(config):
    for text in TEXTS:
        comp = compress(config, text)
        got = decompress(comp)
        assert got == text, (config, text[:40], got[:40])
