#!/usr/bin/env python3
"""Benchmark corpus tooling (mirror of etc/get_datasets.py +
etc/datasets_config.py).

The reference downloads Pizza&Chili / commoncrawl / wiki corpora
(datasets_config.py:20-27). This environment has no network egress, so the
tool has two modes:
  - `--synthesize`: materialize deterministic synthetic stand-ins with the
    statistical character of each corpus class (dna/english/sources/xml),
    using the framework's generators; sizes in MiB.
  - with network (real deployments): the documented URLs below.

Usage: python etc/datasets.py --synthesize datasets/ --size 1
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

# Pizza&Chili corpus URLs (datasets_config.py; for deployments with network)
PIZZA_CHILI = {
    "pc-dna": "http://pizzachili.dcc.uchile.cl/texts/dna/dna.gz",
    "pc-english": "http://pizzachili.dcc.uchile.cl/texts/nlang/english.gz",
    "pc-sources": "http://pizzachili.dcc.uchile.cl/texts/code/sources.gz",
    "pc-dblp.xml": "http://pizzachili.dcc.uchile.cl/texts/xml/dblp.xml.gz",
    "pc-proteins": "http://pizzachili.dcc.uchile.cl/texts/protein/proteins.gz",
    "pcr-cere": "http://pizzachili.dcc.uchile.cl/repcorpus/real/cere.gz",
    "pcr-einstein.en": "http://pizzachili.dcc.uchile.cl/repcorpus/real/einstein.en.txt.gz",
}


def synth_dna(rng, n):
    return rng.choice(np.frombuffer(b"ACGT", np.uint8), n).tobytes()


def synth_english(rng, n):
    words = [w.encode() for w in (
        "the quick brown fox jumps over lazy dog compression suffix array "
        "grammar factorization entropy huffman lempel ziv welch text data "
        "structure algorithm framework parallel device kernel"
    ).split()]
    # vectorized: draw all word ids and separators up front (the former
    # word-at-a-time loop took minutes at 50 MB); same distribution —
    # uniform words, 10% sentence breaks. Shortfalls draw MORE random
    # words (never self-concatenate: that would inject a giant repeat and
    # skew every suffix-structure benchmark).
    seps = (b". ", b" ")
    avg = sum(len(w) for w in words) / len(words) + 1.1
    parts = []
    total = 0
    while total < n:
        est = max(16, int((n - total) / avg) + 16)
        ids = rng.integers(0, len(words), est)
        dots = rng.random(est) <= 0.1
        chunk = b"".join(
            words[i] + seps[0 if d else 1] for i, d in zip(ids, dots)
        )
        parts.append(chunk)
        total += len(chunk)
    return b"".join(parts)[:n]


def synth_sources(rng, n):
    frag = open(os.path.join(os.path.dirname(__file__), "compare.py"), "rb").read()
    reps = -(-n // len(frag))
    data = bytearray(frag * reps)
    # sprinkle random mutations for realistic repetitiveness
    idx = rng.integers(0, len(data), len(data) // 200)
    vals = rng.integers(32, 127, len(idx))
    for i, v in zip(idx, vals):
        data[i] = v
    return bytes(data[:n])


def synth_xml(rng, n):
    out = bytearray()
    i = 0
    while len(out) < n:
        out += (
            f"<article key=\"a{i}\"><author>Name {int(rng.integers(0,999))}"
            f"</author><title>Title {int(rng.integers(0,9999))}</title>"
            f"<year>{int(rng.integers(1970, 2026))}</year></article>\n"
        ).encode()
        i += 1
    return bytes(out[:n])


SYNTHS = {
    "dna": synth_dna,
    "english": synth_english,
    "sources": synth_sources,
    "xml": synth_xml,
}


def download(dest: str, size_mb: float, only: str = "") -> int:
    """Fetch + gunzip + prefix-cut the Pizza&Chili corpora
    (etc/get_datasets.py / datasets_config.py:20-27 behavior). Returns the
    number of files materialized; prints a clear notice per failure so
    airgapped environments can fall back to --synthesize."""
    import gzip
    import urllib.request

    os.makedirs(dest, exist_ok=True)
    n = int(size_mb * (1 << 20))
    got = 0
    for name, url in PIZZA_CHILI.items():
        if only and only not in name:
            continue
        path = os.path.join(dest, f"{name}.{size_mb:g}MB")
        if os.path.exists(path):
            print(f"{path} (cached)")
            got += 1
            continue
        try:
            with urllib.request.urlopen(url, timeout=30) as resp:
                raw = resp.read()
            data = gzip.decompress(raw)[:n]
            with open(path, "wb") as f:
                f.write(data)
            print(path)
            got += 1
        except Exception as e:  # no egress / server down
            print(f"SKIP {name}: {type(e).__name__}: {e}", file=sys.stderr)
    if not got:
        print(
            "no corpus downloaded (no network egress?) — use --synthesize "
            "for deterministic stand-ins",
            file=sys.stderr,
        )
    return got


def synth_large(fn, rng, n: int, out_path: str, base_mb: int = 4) -> None:
    """GB-scale synthesis (the analogue of the reference's 10 GB wiki
    config, etc/large_datasets_config.py): a base chunk from the per-kind
    generator is tiled with per-tile random mutations and streamed to
    disk, so multi-GB files materialize in seconds instead of the
    word-at-a-time loop."""
    base = np.frombuffer(fn(rng, base_mb << 20), np.uint8).copy()
    written = 0
    with open(out_path, "wb") as f:
        while written < n:
            chunk = base.copy()
            idx = rng.integers(0, len(chunk), max(1, len(chunk) // 500))
            chunk[idx] = rng.integers(32, 127, len(idx)).astype(np.uint8)
            take = min(len(chunk), n - written)
            f.write(chunk[:take].tobytes())
            written += take


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--synthesize", metavar="DIR")
    ap.add_argument("--download", metavar="DIR")
    ap.add_argument("--size", type=float, default=1.0, help="MiB per corpus")
    ap.add_argument(
        "--gb", type=float, default=0.0,
        help="GiB per corpus (streams tiled+mutated chunks; use for >=1 GiB)",
    )
    ap.add_argument("--only", default="")
    args = ap.parse_args()
    if not args.synthesize and not args.download:
        ap.error("need --synthesize DIR and/or --download DIR")
    if args.download:
        download(args.download, args.size, args.only)
    if not args.synthesize:
        return
    os.makedirs(args.synthesize, exist_ok=True)
    rng = np.random.default_rng(0)
    if args.gb:
        n = int(args.gb * (1 << 30))
        for name, fn in SYNTHS.items():
            if args.only and args.only != name:
                continue
            path = os.path.join(args.synthesize, f"{name}.{args.gb:g}GB")
            synth_large(fn, rng, n, path)
            print(path)
        return
    n = int(args.size * (1 << 20))
    for name, fn in SYNTHS.items():
        if args.only and args.only != name:
            continue
        path = os.path.join(args.synthesize, f"{name}.{args.size:g}MB")
        with open(path, "wb") as f:
            f.write(fn(rng, n))
        print(path)


if __name__ == "__main__":
    main()
