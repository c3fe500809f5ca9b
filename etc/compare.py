#!/usr/bin/env python3
"""Cross-compressor benchmark harness (mirror of etc/compare.py).

Runs a suite of (name, command-pair) entries per input file, measuring
compression/decompression wall time, peak RSS, compressed rate, and a
SHA256 roundtrip check — the reference harness's columns (etc/compare.py:
91-99, 252-265) with resource.getrusage in place of valgrind massif.

Suite entries are either tudocomp-tpu algorithm id strings or external
tool pairs. Usage:
    python etc/compare.py FILE [FILE...] [--suite etc/compare-suites/default.suite]
    python etc/compare.py FILE --json out.json
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import resource
import shutil
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


class TdcPair:
    def __init__(self, algorithm: str):
        self.name = f"tdc: {algorithm}"
        self.algorithm = algorithm

    def compress_cmd(self, src, dst):
        return [
            sys.executable,
            "-m",
            "tudocomp_tpu",
            "-a",
            self.algorithm,
            src,
            "-o",
            dst,
            "-f",
        ]

    def decompress_cmd(self, src, dst):
        return [sys.executable, "-m", "tudocomp_tpu", "-d", src, "-o", dst, "-f"]


class ToolPair:
    """External tool pair, e.g. gzip -1 (etc/compare-suites style)."""

    def __init__(self, name, compress, decompress):
        self.name = name
        self._c = compress
        self._d = decompress

    def compress_cmd(self, src, dst):
        return ["sh", "-c", f"{self._c} < {src} > {dst}"]

    def decompress_cmd(self, src, dst):
        return ["sh", "-c", f"{self._d} < {src} > {dst}"]


def default_suite():
    suite = [
        TdcPair("encode(huff)"),
        TdcPair("lz78"),
        TdcPair("lzw"),
        TdcPair("lzss_lcp(coder=huff)"),
        TdcPair("lcpcomp(coder=huff)"),
        TdcPair("repair(coder=huff)"),
        TdcPair("bwt:rle:mtf:encode(huff)"),
        TdcPair("lfs_comp"),
        TdcPair("lz78u"),
    ]
    for tool, c, d in (
        ("gzip -1", "gzip -1 -c", "gzip -d -c"),
        ("gzip -9", "gzip -9 -c", "gzip -d -c"),
        ("bzip2 -9", "bzip2 -9 -c", "bzip2 -d -c"),
        ("xz -9", "xz -9 -c -T1", "xz -d -c"),
    ):
        if shutil.which(c.split()[0]):
            suite.append(ToolPair(tool, c, d))
    return suite


def run_timed(cmd) -> tuple[float, int, int]:
    """(wall seconds, peak child RSS bytes, returncode)."""
    before = resource.getrusage(resource.RUSAGE_CHILDREN).ru_maxrss
    t0 = time.perf_counter()
    rc = subprocess.run(
        cmd, stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL
    ).returncode
    dt = time.perf_counter() - t0
    after = resource.getrusage(resource.RUSAGE_CHILDREN).ru_maxrss
    return dt, max(after, before) * 1024, rc


def sha256(path):
    h = hashlib.sha256()
    with open(path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest()


def load_suite(path: str):
    """Evaluate a .suite file (a Python list literal over TdcPair/ToolPair,
    mirroring etc/compare-suites/default.suite)."""
    scope = {"TdcPair": TdcPair, "ToolPair": ToolPair}
    with open(path) as f:
        exec(compile(f.read(), path, "exec"), scope)
    suite = scope["SUITE"]
    return [
        p
        for p in suite
        if not isinstance(p, ToolPair) or shutil.which(p._c.split()[0])
    ]


def collect_phases(pair, src):
    """Re-run a tdc compression with --stats and return the phase tree
    (wall ms + memOff/memPeak/memFinal per phase — the reference's
    malloc-override columns, tdc --stats JSON)."""
    if not isinstance(pair, TdcPair):
        return None
    with tempfile.TemporaryDirectory() as td:
        cmd = pair.compress_cmd(src, os.path.join(td, "c.bin"))
        cmd.insert(len(cmd), "--stats")
        proc = subprocess.run(cmd, capture_output=True, text=True)
        for line in proc.stdout.splitlines():
            line = line.strip()
            if line.startswith("{"):
                try:
                    return json.loads(line).get("data")
                except json.JSONDecodeError:
                    continue
    return None


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("files", nargs="+")
    ap.add_argument("--json", default=None)
    ap.add_argument("--filter", default="")
    ap.add_argument("--suite", default=None, metavar="FILE.suite")
    ap.add_argument(
        "--phases",
        action="store_true",
        help="attach per-phase time+memory trees for tdc pairs (--stats)",
    )
    args = ap.parse_args()

    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    os.environ.update(env)

    suite = load_suite(args.suite) if args.suite else default_suite()
    suite = [p for p in suite if args.filter in p.name]
    results = []
    for path in args.files:
        size = os.path.getsize(path)
        digest = sha256(path)
        print(f"\n=== {path} ({size} bytes) ===")
        print(f"{'pair':38s} {'C time':>9s} {'C mem':>9s} {'D time':>9s} "
              f"{'rate':>8s} {'ok':>4s}")
        for pair in suite:
            with tempfile.TemporaryDirectory() as td:
                comp = os.path.join(td, "c.bin")
                deco = os.path.join(td, "d.bin")
                ct, cmem, rc1 = run_timed(pair.compress_cmd(path, comp))
                if rc1 != 0 or not os.path.exists(comp):
                    print(f"{pair.name:38s} {'FAIL':>9s}")
                    continue
                dt, _dmem, rc2 = run_timed(pair.decompress_cmd(comp, deco))
                ok = rc2 == 0 and os.path.exists(deco) and sha256(deco) == digest
                rate = os.path.getsize(comp) / size if size else 0.0
                row = {
                    "file": path,
                    "n": size,
                    "pair": pair.name,
                    "compress_s": round(ct, 3),
                    "compress_mem": cmem,
                    "decompress_s": round(dt, 3),
                    "rate": round(rate, 4),
                    "ok": bool(ok),
                }
                if args.phases:
                    row["phases"] = collect_phases(pair, path)
                results.append(row)
                print(
                    f"{pair.name:38s} {ct:8.3f}s {cmem/1e6:8.1f}M {dt:8.3f}s "
                    f"{rate*100:7.2f}% {'OK' if ok else 'BAD':>4s}"
                )
    if args.json:
        with open(args.json, "w") as f:
            json.dump(results, f, indent=2)
    bad = [r for r in results if not r["ok"]]
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
