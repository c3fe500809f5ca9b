"""ctypes loader for the C++ host runtime (native/tdc_native.cpp).

Builds the shared library on demand with g++ (cached next to the source).
Every entry point has a pure-Python fallback in the calling module, so the
framework degrades gracefully if no compiler is available.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
from typing import Optional

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "native")
_SRC_PATH = os.path.join(_NATIVE_DIR, "tdc_native.cpp")

_lib: Optional[ctypes.CDLL] = None
_tried = False


def _so_path() -> str:
    # Key the artifact on the source hash: git checkouts reset mtimes, so an
    # mtime comparison against a stale committed .so silently loads old code.
    with open(_SRC_PATH, "rb") as f:
        digest = hashlib.sha256(f.read()).hexdigest()[:12]
    return os.path.join(_NATIVE_DIR, f"libtdc_native-{digest}.so")


def _build(so_path: str) -> bool:
    try:
        r = subprocess.run(
            ["g++", "-O3", "-std=c++17", "-fPIC", "-shared", "-o", so_path, _SRC_PATH],
            capture_output=True,
            timeout=240,
        )
        return r.returncode == 0
    except Exception:
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    so_path = _so_path()
    if not os.path.exists(so_path):
        if not _build(so_path):
            return None
    try:
        lib = ctypes.CDLL(so_path)
    except OSError:
        return None

    i64 = ctypes.c_int64
    u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
    u32p = np.ctypeslib.ndpointer(np.uint32, flags="C_CONTIGUOUS")

    lib.tdc_lz78_parse.restype = i64
    lib.tdc_lz78_parse.argtypes = [u8p, i64, u32p, u8p]
    lib.tdc_lz78_parse_trie.restype = i64
    lib.tdc_lz78_parse_trie.argtypes = [u8p, i64, u32p, u8p, ctypes.c_int32]
    i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
    lib.tdc_csh_footprint.restype = i64
    lib.tdc_csh_footprint.argtypes = [u8p, i64, i64p]
    lib.tdc_lz78_parse_hash.restype = i64
    lib.tdc_lz78_parse_hash.argtypes = [
        u8p,
        i64,
        u32p,
        u8p,
        ctypes.c_int32,
        ctypes.c_int32,
        ctypes.c_int32,
        np.ctypeslib.ndpointer(np.uint64, flags="C_CONTIGUOUS"),
    ]
    lib.tdc_lzw_parse_trie.restype = i64
    lib.tdc_lzw_parse_trie.argtypes = [u8p, i64, u32p, ctypes.c_int32]
    lib.tdc_lz78_decode.restype = i64
    lib.tdc_lz78_decode.argtypes = [u32p, u8p, i64, u8p, i64]
    lib.tdc_lzw_parse.restype = i64
    lib.tdc_lzw_parse.argtypes = [u8p, i64, u32p]
    lib.tdc_lzw_decode.restype = i64
    lib.tdc_lzw_decode.argtypes = [u32p, i64, u8p, i64]
    lib.tdc_rle_decode.restype = i64
    lib.tdc_rle_decode.argtypes = [u8p, i64, i64, u8p, i64]
    lib.tdc_mtf_decode.restype = None
    lib.tdc_mtf_decode.argtypes = [u8p, i64, u8p]
    lib.tdc_mtf_encode.restype = None
    lib.tdc_mtf_encode.argtypes = [u8p, i64, u8p]
    lib.tdc_huffman_decode_canonical.restype = i64
    lib.tdc_huffman_decode_canonical.argtypes = [
        u8p,
        i64,
        i64,
        np.ctypeslib.ndpointer(np.uint64, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS"),
        u8p,
        ctypes.c_int32,
        u8p,
        i64,
    ]
    lib.tdc_read_tokens.restype = i64
    lib.tdc_read_tokens.argtypes = [
        u8p,
        i64,
        i64,
        np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS"),
        i64,
        np.ctypeslib.ndpointer(np.uint64, flags="C_CONTIGUOUS"),
    ]
    lib.tdc_pack_tokens.restype = i64
    lib.tdc_pack_tokens.argtypes = [
        np.ctypeslib.ndpointer(np.uint64, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS"),
        i64,
        u8p,
        i64,
    ]
    lib.tdc_huffman_decode.restype = i64
    lib.tdc_huffman_decode.argtypes = [
        u8p,
        i64,
        i64,
        u8p,
        u8p,
        ctypes.c_int32,
        u8p,
        i64,
    ]
    i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
    i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
    lib.tdc_sais.restype = ctypes.c_int32
    lib.tdc_sais.argtypes = [u8p, i64, i32p]
    lib.tdc_plcp_from_phi.restype = None
    lib.tdc_plcp_from_phi.argtypes = [u8p, i64, i32p, i32p]
    lib.tdc_inverse_perm.restype = None
    lib.tdc_inverse_perm.argtypes = [i32p, i64, i32p]
    lib.tdc_gather_i32.restype = None
    lib.tdc_gather_i32.argtypes = [i32p, i32p, i64, i32p]
    lib.tdc_phi_from_sa.restype = None
    lib.tdc_phi_from_sa.argtypes = [i32p, i64, i32p]
    lib.tdc_bwt_walk.restype = None
    lib.tdc_bwt_walk.argtypes = [u8p, i64p, i64, u8p]
    lib.tdc_lzss_window_parse.restype = i64
    lib.tdc_lzss_window_parse.argtypes = [u8p, i64, i64, i64, u8p, u32p, u32p, u32p]
    lib.tdc_lzss_lcp_factorize.restype = i64
    lib.tdc_lzss_lcp_factorize.argtypes = [i32p, i32p, i32p, i64, i64, u32p, u32p, u32p]
    lib.tdc_lcpcomp_arrays_factorize.restype = i64
    lib.tdc_lcpcomp_arrays_factorize.argtypes = [
        i32p,
        i32p,
        i32p,
        i64,
        i64,
        u32p,
        u32p,
        u32p,
    ]
    lib.tdc_lcpcomp_heap_factorize.restype = i64
    lib.tdc_lcpcomp_heap_factorize.argtypes = [
        i32p,
        i32p,
        i32p,
        i64,
        i64,
        u32p,
        u32p,
        u32p,
    ]
    for fct in ("tdc_lcpcomp_bheap_factorize", "tdc_lcpcomp_plcp_factorize"):
        fn = getattr(lib, fct)
        fn.restype = i64
        fn.argtypes = [i32p, i32p, i32p, i64, i64, u32p, u32p, u32p]
    lib.tdc_esp_derive.restype = i64
    lib.tdc_esp_derive.argtypes = [i32p, i32p, i64, i64, u8p, i64]
    lib.tdc_canonical_decode_idx.restype = i64
    lib.tdc_canonical_decode_idx.argtypes = [
        u8p, i64, i64, i64p, i64p, i64, i32p, i64,
    ]
    lib.tdc_sparse_isa_build.restype = None
    lib.tdc_sparse_isa_build.argtypes = [i64p, i64, i64, u8p, i64p]
    u64p = np.ctypeslib.ndpointer(np.uint64, flags="C_CONTIGUOUS")
    lib.tdc_lzss_stream_parse.restype = i64
    lib.tdc_lzss_stream_parse.argtypes = [
        u8p,  # data
        i64,  # nbytes
        i64,  # start_bit
        i64,  # valid_bits
        i64,  # n
        i64,  # flen_min
        i64,  # flen_max
        i64,  # fdist_max
        ctypes.c_int32,  # use_huff
        u64p,  # firstcodes
        i64p,  # psl
        u8p,  # ordered_syms
        ctypes.c_int32,  # longest
        u8p,  # out
        u32p,  # tgt
        u32p,  # srcs
        u32p,  # lens
        i64p,  # cursor_out
    ]
    lib.tdc_lzss_apply_factors.restype = None
    lib.tdc_lzss_apply_factors.argtypes = [u8p, u32p, u32p, u32p, i64]
    lib.tdc_lcpcomp_maxlcp_factorize.restype = i64
    lib.tdc_lcpcomp_maxlcp_factorize.argtypes = [
        i32p,
        i32p,
        i32p,
        i64,
        i64,
        u32p,
        u32p,
        u32p,
    ]
    lib.tdc_lcpcomp_plcppeaks_factorize.restype = i64
    lib.tdc_lcpcomp_plcppeaks_factorize.argtypes = [
        i32p,
        i32p,
        i32p,
        i64,
        i64,
        u32p,
        u32p,
        u32p,
    ]
    lib.tdc_lcpcomp_compact_decode.restype = ctypes.c_int32
    lib.tdc_lcpcomp_compact_decode.argtypes = [u8p, i64, u32p, u32p, u32p, i64]
    lib.tdc_lcpcomp_queuelist_decode.restype = ctypes.c_int32
    lib.tdc_lcpcomp_queuelist_decode.argtypes = [u8p, i64, u32p, u32p, u32p, i64]
    lib.tdc_lcpcomp_multimap_decode.restype = ctypes.c_int32
    lib.tdc_lcpcomp_multimap_decode.argtypes = [u8p, i64, u32p, u32p, u32p, i64, i64]
    lib.tdc_lcpcomp_flatten.restype = None
    lib.tdc_lcpcomp_flatten.argtypes = [u32p, u32p, u32p, i64]
    lib.tdc_lcpcomp_scan_decode.restype = ctypes.c_int32
    lib.tdc_lcpcomp_scan_decode.argtypes = [u8p, i64, u32p, u32p, u32p, i64, i64]
    lib.tdc_segment_interleave.restype = i64
    lib.tdc_segment_interleave.argtypes = [
        np.ctypeslib.ndpointer(np.uint64, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS"),
        i64,
        i64,
        np.ctypeslib.ndpointer(np.uint64, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS"),
    ]
    lib.tdc_esp_round.restype = i64
    lib.tdc_esp_round.argtypes = [
        u32p,
        i64,
        i64,
        u32p,
        u32p,
        u32p,
        np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS"),
    ]
    lib.tdc_repair_build.restype = i64
    lib.tdc_repair_build.argtypes = [
        u32p,
        i64,
        i64,
        u32p,
        u32p,
        np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS"),
    ]
    lib.tdc_repair_expand.restype = i64
    lib.tdc_repair_expand.argtypes = [u32p, u32p, i64, u32p, i64, u8p, i64]
    u64p = np.ctypeslib.ndpointer(np.uint64, flags="C_CONTIGUOUS")
    lib.tdc_arith_encode.restype = i64
    lib.tdc_arith_encode.argtypes = [u8p, i64, u32p, ctypes.c_uint64, u64p]
    lib.tdc_arith_decode.restype = i64
    lib.tdc_arith_decode.argtypes = [
        u64p,
        i64,
        u8p,
        u32p,
        ctypes.c_int32,
        ctypes.c_uint64,
        i64,
        u8p,
    ]
    _lib = lib
    return _lib


def memhook_so_path() -> str:
    """Path of the LD_PRELOAD malloc interposer (native/tdc_memhook.c),
    building it on demand. Returns "" when unavailable."""
    src = os.path.join(_NATIVE_DIR, "tdc_memhook.c")
    if not os.path.exists(src):
        return ""
    with open(src, "rb") as f:
        digest = hashlib.sha256(f.read()).hexdigest()[:12]
    so = os.path.join(_NATIVE_DIR, f"libtdc_memhook-{digest}.so")
    if os.path.exists(so):
        return so
    try:
        r = subprocess.run(
            ["gcc", "-O2", "-fPIC", "-shared", "-o", so, src, "-ldl"],
            capture_output=True,
            timeout=120,
        )
        return so if r.returncode == 0 else ""
    except Exception:
        return ""


def memhook_counters():
    """(current_fn, peak_fn, reset_peak_fn) when the malloc interposer is
    preloaded into this process; None otherwise."""
    try:
        lib = ctypes.CDLL(None)
        lib.tdc_memhook_active  # raises if not preloaded
        lib.tdc_mem_current.restype = ctypes.c_longlong
        lib.tdc_mem_peak.restype = ctypes.c_longlong
        return lib.tdc_mem_current, lib.tdc_mem_peak, lib.tdc_mem_reset_peak
    except Exception:
        return None
