"""tdc-compatible command-line driver.

Mirror of the reference CLI (src/tudocomp_driver/tudocomp_driver.cpp:52-398,
include/tudocomp_driver/Options.hpp:15-306): compresses/decompresses a file,
stdin, or a generated string; writes the self-describing `<id>%` header;
`--stats` emits the Charter-compatible JSON {meta, data} document.

Usage:  python -m tudocomp_tpu [OPTION] FILE
   or:  python -m tudocomp_tpu [OPTION] --usestdin
   or:  python -m tudocomp_tpu [OPTION] -g GENERATOR
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

COMPRESSED_FILE_ENDING = "tdc"
UNCOMPRESSED_FILE_ENDING = "decomp"


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="tdc",
        description=(
            "Compresses or decompresses a file (1), an input received via "
            "stdin (2) or a generated string (3)."
        ),
        add_help=False,
    )
    p.add_argument("-a", "--algorithm", metavar="ALGORITHM", default="")
    p.add_argument("-d", "--decompress", action="store_true")
    p.add_argument("-f", "--force", action="store_true")
    p.add_argument("-g", "--generator", metavar="GENERATOR", default="")
    p.add_argument("-l", "--list", action="store_true")
    p.add_argument("-o", "--output", metavar="FILE", default="")
    p.add_argument("-s", "--stats", nargs="?", const="", default=None, metavar="TITLE")
    p.add_argument("-v", "--version", action="store_true")
    p.add_argument("--help", action="store_true")
    p.add_argument("--raw", action="store_true")
    p.add_argument("--usestdin", action="store_true")
    p.add_argument("--usestdout", action="store_true")
    p.add_argument("--logdir", default=None)
    p.add_argument("--loglevel", default=None)
    p.add_argument("--logverbosity", default=None)
    p.add_argument("file", nargs="?", default="")
    return p


def bad_usage(msg: str) -> int:
    print(f"Error: {msg}", file=sys.stderr)
    print("Try --help for more information.", file=sys.stderr)
    return 1


def _maybe_reexec_with_memhook() -> None:
    """TDC_MALLOC_HOOK=1: re-exec with the native malloc interposer
    preloaded, giving --stats byte-accurate heap columns (the analogue of
    the reference linking src/tudocomp_stat/malloc.cpp into tdc). No-op
    when already preloaded or the hook cannot be built."""
    if os.environ.get("TDC_MALLOC_HOOK") != "1":
        return
    import ctypes

    try:
        ctypes.CDLL(None).tdc_memhook_active
        return  # already preloaded
    except AttributeError:
        pass
    # one-shot guard: if a previous re-exec failed to apply the preload
    # (noexec tmp, loader rejection, secure-exec stripping), fall back to
    # tracemalloc instead of re-exec'ing forever
    if os.environ.get("TDC_MEMHOOK_REEXEC") == "1":
        return
    from .native import memhook_so_path

    so = memhook_so_path()
    if not so:
        return
    env = dict(os.environ)
    pre = env.get("LD_PRELOAD", "")
    env["LD_PRELOAD"] = f"{so}:{pre}" if pre else so
    env["TDC_TRACK_MEM"] = env.get("TDC_TRACK_MEM", "1")
    env["TDC_MEMHOOK_REEXEC"] = "1"
    os.execve(sys.executable, [sys.executable, "-m", "tudocomp_tpu"] + sys.argv[1:], env)


def main(argv=None) -> int:
    if argv is None:
        _maybe_reexec_with_memhook()
    args = build_parser().parse_args(argv)

    if args.help:
        build_parser().print_help()
        return 0
    if args.version:
        from . import __version__

        print(f"tdc (tudocomp-tpu) {__version__}")
        return 0

    from . import REGISTRY
    from .driver import compress as do_compress_fn, decompress as do_decompress_fn
    from .logging_setup import setup_logging
    from .stats.phase import StatPhase

    setup_logging(args.logdir, args.loglevel, args.logverbosity)

    if args.stats is not None and os.environ.get("TDC_TRACK_MEM") != "0":
        # --stats implies per-phase heap columns (reference malloc-override
        # parity); library users opt in via TDC_TRACK_MEM=1
        StatPhase.track_memory = True

    if args.list:
        print("This build supports the following algorithms:")
        print()
        for t in REGISTRY.types():
            print(REGISTRY.generate_doc_string(t))
            print()
        return 0

    do_compress = not args.decompress

    # -- select input ---------------------------------------------------------
    n_inputs = bool(args.usestdin) + bool(args.generator) + bool(args.file)
    if n_inputs > 1:
        return bad_usage("trying to use multiple inputs")
    if n_inputs == 0:
        return bad_usage("no input given")
    if args.generator and not do_compress:
        return bad_usage("trying to decompress generated string")

    start_time = time.time()
    if args.usestdin:
        data = sys.stdin.buffer.read()
        in_name = "<stdin>"
    elif args.generator:
        gen = REGISTRY.select(args.generator, "generator")
        data = gen.generate()
        in_name = args.generator
    else:
        if not os.path.exists(args.file):
            print(f"input path not found or is not a file: {args.file}", file=sys.stderr)
            return 1
        with open(args.file, "rb") as f:
            data = f.read()
        in_name = args.file
    in_size = len(data)

    # -- select output --------------------------------------------------------
    if args.output and args.usestdout:
        return bad_usage("trying to use multiple outputs")
    ofile = None
    if not args.usestdout:
        if args.output:
            ofile = args.output
        elif do_compress and args.file:
            ofile = args.file + "." + COMPRESSED_FILE_ENDING
        else:
            return bad_usage(
                "either specify a filename (-o filename) or state that the "
                "output is standard output (--usestdout)"
            )
        if os.path.exists(ofile) and not args.force:
            print(f"output file already exists: {ofile}", file=sys.stderr)
            return 1

    # -- run ------------------------------------------------------------------
    if do_compress and not args.algorithm:
        return bad_usage("compression requires an algorithm (-a)")
    if not do_compress and args.raw and not args.algorithm:
        return bad_usage("raw decompression requires an algorithm (-a)")

    config = args.algorithm
    try:
        with StatPhase("root") as root:
            if do_compress:
                result = do_compress_fn(args.algorithm, data, raw=args.raw)
            else:
                if not args.raw and not config:
                    # the id string for --stats comes from the header
                    head, _, _ = bytes(data[:1024]).partition(b"%")
                    config = head.decode(errors="replace")
                result = do_decompress_fn(
                    data, id_string=args.algorithm or None, raw=args.raw
                )
    except Exception as e:
        print(f"Error: {e}", file=sys.stderr)
        return 1

    if ofile is not None:
        with open(ofile, "wb") as f:
            f.write(result)
    else:
        sys.stdout.buffer.write(result)
        sys.stdout.buffer.flush()

    # -- stats (tudocomp_driver.cpp:361-391 JSON document) --------------------
    if args.stats is not None:
        out_size = len(result) if ofile is None else os.path.getsize(ofile)
        doc = {
            "meta": {
                "title": args.stats,
                "startTime": int(start_time),
                "config": config or "<none>",
                "input": in_name,
                "inputSize": in_size,
                "output": ofile if ofile is not None else "<stdout>",
                "outputSize": out_size,
                "rate": 0.0 if in_size == 0 else out_size / in_size,
            },
            "data": root.to_dict(),
        }
        print(json.dumps(doc))

    return 0


if __name__ == "__main__":
    try:
        sys.exit(main())
    except BrokenPipeError:
        os.dup2(os.open(os.devnull, os.O_WRONLY), sys.stdout.fileno())
        sys.exit(0)
