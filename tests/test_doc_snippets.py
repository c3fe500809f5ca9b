"""Doc-snippet tests: keep docs/Documentation.md honest.

Mirror of the reference's compiled doc snippets
(test/CMakeLists.txt:5-13, test/doc_snippets/*.cpp): every fenced python
block in the documentation must execute, every DSL example id must parse
against the live registry, and every documented option/axis must exist.
"""

from __future__ import annotations

import re
from pathlib import Path

import pytest

DOC = Path(__file__).resolve().parent.parent / "docs" / "Documentation.md"
TEXT = DOC.read_text()


def _blocks(lang: str) -> list[str]:
    return re.findall(rf"```{lang}\n(.*?)```", TEXT, re.S)


def test_python_snippets_execute():
    blocks = _blocks("python")
    assert len(blocks) >= 3
    for code in blocks:
        ns: dict = {}
        if "def compress" in code or "class MyCompressor" in code:
            exec(code, ns)  # definition snippets just need to run
            continue
        # executable snippets: substitute placeholder data
        code = code.replace('b"your data"', 'b"doc snippet data " * 9')
        code = code.replace("data,", 'b"doc snippet data " * 9,')
        exec(code, ns)


def test_dsl_examples_parse():
    from tudocomp_tpu.registry import REGISTRY

    # the fenced plain block in section 2 lists example ids, one per line
    m = re.search(r"```\nencode\(huff\)\n(.*?)```", TEXT, re.S)
    dsl_block = "encode(huff)\n" + (m.group(1) if m else "")
    examples = [
        ln.strip()
        for ln in dsl_block.splitlines()
        if ln.strip() and "(" in ln and not ln.strip().startswith("#")
    ]
    assert len(examples) >= 5, examples
    for ex in examples:
        av = REGISTRY.parse_algorithm_id(ex, "compressor")
        assert av.name


def test_chain_sugar_documented_and_works():
    from tudocomp_tpu.driver import compress, decompress

    assert "bwt:rle:mtf:encode(huff)" in TEXT
    data = b"documentation chain example " * 8
    assert decompress(compress("bwt:rle:mtf:encode(huff)", data)) == data


def test_documented_axes_exist():
    from tudocomp_tpu.registry import REGISTRY

    # coders listed in the docs must all be registered
    for cid in ("ascii", "bit", "gamma", "delta", "ternary", "vbyte",
                "huff", "arithmetic", "sle"):
        assert cid in TEXT
        assert REGISTRY.get_class("coder", cid)
    # textds axis
    for pid in ("divsufsort", "from_sa", "from_phi", "compressed_lcp",
                "sparse_isa"):
        assert pid in TEXT
    assert REGISTRY.get_class("d_coding", "arith")


def test_cli_flags_documented_flags_exist():
    from tudocomp_tpu.__main__ import build_parser

    parser = build_parser()
    opts = {a for action in parser._actions for a in action.option_strings}
    for flag in ("-a", "-d", "-o", "-f", "-g", "-l", "-s", "--raw",
                 "--usestdin", "--usestdout"):
        assert flag in TEXT
        assert flag in opts, flag


def test_env_overrides_documented_are_real():
    import tudocomp_tpu.device as device

    doc = device.__doc__
    for var in re.findall(r"TDC_DEVICE_[A-Z0-9]+", TEXT):
        assert var in doc, var
