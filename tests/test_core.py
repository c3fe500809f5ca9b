"""Core substrate tests: escaping, vbyte, DSL parsing/evaluation, registry."""

import numpy as np
import pytest

from tudocomp_tpu import REGISTRY, register_all
from tudocomp_tpu.dsl import ParseError, parse
from tudocomp_tpu.io.restrict import EscapeMap, InputRestrictions, escape, unescape
from tudocomp_tpu.io.vbyte import (
    vbyte_decode_array,
    vbyte_decode_stream,
    vbyte_encode,
    vbyte_encode_array,
)

register_all()


# -- escaping ---------------------------------------------------------------


def test_escape_map_pool():
    em = EscapeMap(InputRestrictions((0,), True))
    assert em.escape_byte == 255
    assert em.escape_bytes == [255, 0]
    assert em.replacement_bytes == [255, 254]


@pytest.mark.parametrize(
    "data",
    [
        b"",
        b"hello",
        b"\0",
        b"a\0b\0",
        b"\xff",
        b"\xff\xff\0\xff\0",
        b"\xfe\xff\xc0",
        bytes(range(256)),
    ],
)
def test_escape_unescape_roundtrip(data):
    rest = InputRestrictions((0,), True)
    arr = np.frombuffer(data, dtype=np.uint8)
    esc = escape(arr, rest)
    # escaped data contains no 0 except the final sentinel
    assert (esc[:-1] != 0).all()
    assert esc[-1] == 0
    back = unescape(esc, rest)
    assert back.tobytes() == data


def test_escape_exact_bytes():
    rest = InputRestrictions((0,), False)
    esc = escape(np.frombuffer(b"a\0b", np.uint8), rest)
    # 0 -> [255, 254]; 255 is the escape byte
    assert esc.tobytes() == b"a\xff\xfeb"
    esc2 = escape(np.frombuffer(b"\xff", np.uint8), rest)
    assert esc2.tobytes() == b"\xff\xff"


# -- vbyte -------------------------------------------------------------------


@pytest.mark.parametrize("v", [0, 1, 127, 128, 255, 300, 16383, 16384, 2**40])
def test_vbyte_roundtrip(v):
    enc = vbyte_encode(v)
    arr = np.frombuffer(enc, np.uint8)
    got, consumed = vbyte_decode_stream(arr, 0)
    assert got == v and consumed == len(enc)


def test_vbyte_array_matches_scalar():
    vals = [0, 1, 127, 128, 255, 300, 16383, 16384, 2**40, 5]
    va = vbyte_encode_array(vals)
    scalar = b"".join(vbyte_encode(v) for v in vals)
    assert va.bytes.tobytes() == scalar
    dec, starts = vbyte_decode_array(np.frombuffer(scalar, np.uint8))
    assert list(dec) == vals


# -- DSL ----------------------------------------------------------------------


def test_parse_simple():
    ast = parse("lzss_lcp(coder=huff, threshold=3)")
    assert ast.name == "lzss_lcp"
    assert ast.args[0].keyword == "coder"
    assert ast.args[0].value.name == "huff"
    assert ast.args[1].keyword == "threshold"
    assert ast.args[1].value.name == "3"


def test_parse_chain_sugar():
    ast = parse("bwt:rle:mtf")
    assert ast.name == "chain"
    assert ast.args[0].value.name == "bwt"
    inner = ast.args[1].value
    assert inner.name == "chain"
    assert inner.args[0].value.name == "rle"
    assert inner.args[1].value.name == "mtf"


def test_parse_nested():
    ast = parse("encode(coder=gamma)")
    assert ast.args[0].value.name == "gamma"


def test_parse_errors():
    with pytest.raises(ParseError):
        parse("foo(")
    with pytest.raises(ParseError):
        parse("foo)x")


def test_evaluate_defaults():
    av = REGISTRY.parse_algorithm_id("rle")
    assert av.options["offset"] == "0"
    av2 = REGISTRY.parse_algorithm_id("rle(offset=5)")
    assert av2.options["offset"] == "5"
    av3 = REGISTRY.parse_algorithm_id("rle(7)")  # positional
    assert av3.options["offset"] == "7"


def test_evaluate_sub_algorithm():
    av = REGISTRY.parse_algorithm_id("encode(coder=gamma)")
    assert av.options["coder"].name == "gamma"


def test_evaluate_unknown_option():
    with pytest.raises(ParseError):
        REGISTRY.parse_algorithm_id("rle(bogus=1)")


def test_registry_listing():
    names = REGISTRY.names("compressor")
    for expected in ("noop", "rle", "mtf", "encode", "chain"):
        assert expected in names
    doc = REGISTRY.generate_doc_string("compressor")
    assert "rle" in doc


def test_all_algorithms_with_static():
    combos = REGISTRY.all_algorithms_with_static("coder")
    assert "gamma" in combos and "bit" in combos
    comp_combos = REGISTRY.all_algorithms_with_static("compressor")
    assert any(c.startswith("encode(coder=") for c in comp_combos)
