"""Test helpers mirroring tudocomp's test/test/util.hpp discipline."""

from __future__ import annotations

import numpy as np

from tudocomp_tpu import driver

# Border-case corpus, mirror of roundtrip_batch (test/test/util.hpp:98-178):
# empty string, single chars, runs, repeats, Unicode, \0-containing strings.
CORPUS = [
    b"",
    b"\0",
    b"a",
    b"aaaaaaaaa",
    b"banana",
    b"ananas",
    b"abcdebcdeabc",
    b"abcdebcdeabcd",
    b"foobar\0foobar",
    b"abababab",
    b"abaaabbababb",
    "asdfasctjkcbweasbebvtiwetwcnbwbbqnqxernqzezwuqwezuet"
    "zuwezuiblllbbbbbbbbbbbbbbbbbbbbbbbbbbbbbbbbbbbbbbbbbbbbbbbbbbbb".encode(),
    "ประเทศไทย中华Việt Nam".encode(),
    (
        "Lorem ipsum dolor sit amet, sea ut etiam solet salut-andi, "
        "sed et equidem suavitate honestatis."
    ).encode(),
    "เลอะเทอะ らりるれろ Русский язык 한국어 Ελληνικά".encode(),
    bytes(range(1, 256)),
    b"\xff\xfe\xc0\xc1\xf5\xfd escape pool bytes \xff\xff\0\0",
]


def generator_strings() -> list[bytes]:
    """Fibonacci / Thue-Morse / run-rich / random strings of growing size
    (mirror of on_string_generators, test/test/util.hpp:180-207)."""
    out = []
    a, b = b"b", b"a"
    for _ in range(12):
        a, b = b, b + a
    out.append(b)
    t = "0"
    for _ in range(10):
        t = t + "".join("1" if c == "0" else "0" for c in t)
    out.append(t.encode())
    rng = np.random.default_rng(0)
    for n in (10, 100, 1000, 10000):
        out.append(rng.integers(33, 123, size=n, dtype=np.uint8).tobytes())
    return out


def roundtrip(id_string: str, text: bytes, check_compressed=None) -> bytes:
    """compress -> (optional compressed check) -> decompress -> equality."""
    comp = driver.compress(id_string, text)
    if check_compressed is not None:
        assert comp == check_compressed, (comp, check_compressed)
    deco = driver.decompress(comp)
    assert deco == text, (
        f"roundtrip failed for {id_string!r} on {text[:80]!r}: got {deco[:80]!r}"
    )
    return comp
