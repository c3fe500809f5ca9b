"""Backend-conditional execution policy: device paths are the default on TPU.

The framework is TPU-native (SURVEY.md §7 stance): when an accelerator
backend is present, compute-heavy stages (SA construction, LZSS
factorization, MTF/RLE transforms, Huffman encode/decode) run on device by
default. Host (native C++/numpy) paths remain the default on CPU-only
installs, where XLA:CPU loses to the tuned native code.

Per-stage env overrides (1 = force device, 0 = force host):
  TDC_DEVICE_SA, TDC_DEVICE_LZSS, TDC_DEVICE_MTF, TDC_DEVICE_RLE,
  TDC_DEVICE_HUFF, TDC_DEVICE_LZ78, TDC_DEVICE_LCPCOMP

Default-on device stages (TPU backend, size gates apply): Huffman block
encode (0.29-0.43 GB/s on v5e, 2.3-3.4x the per-chip target), MTF/RLE
transforms, blockwise LZ78 lockstep parse (bs <= 8 KiB), and — on a
LOCALLY attached TPU — the staged device SA (6x native SA-IS at 16 MiB,
etc/probe_sa2.py; behind the remote tunnel the host<->device transfers
eat the win, so it is opt-in there: see tunnel_backend()).

OPT-IN stages (=1 required) — measured slower than the tuned host paths
on v5e through the tunnel (etc/probe_sa2.py, etc/probe_fact2.py, PERF.md;
host-fetch syncs):
  TDC_DEVICE_SA    behind the tunnel only (local TPUs default on)
  TDC_DEVICE_LZSS  compacted-chain ANSV factorize: exact but gather-
                   bound, ~10x the host monotone stacks
  TDC_DEVICE_HUFF  bit-serial decode: 3x host data-resident, transfer-
                   bound via the tunnel (local TPUs default on)
  TDC_DEVICE_LZ78  =1 additionally enables the bucketed-dictionary
                   kernel for 8 KiB < bs <= 256 KiB blocks
  TDC_DEVICE_LCPCOMP  decode side (gather-bound chain resolve)
"""

from __future__ import annotations

import os
from functools import lru_cache

__all__ = [
    "accelerator_backend",
    "ensure_compile_cache",
    "tunnel_backend",
    "use_device",
]


def ensure_compile_cache() -> None:
    """Point JAX's persistent compile cache at a per-user cache dir.

    The staged sort-heavy device kernels (SA, ESP) compile slowly —
    XLA:CPU spends tens of seconds per variadic lax.sort and the remote
    tunnel adds 20-400 s first-compile latency (PERF.md) — so persistent
    caching is part of the device policy, not an optimization the caller
    must remember. No-op when the user already configured a cache dir."""
    try:
        import jax

        if jax.config.jax_compilation_cache_dir:
            return
        import pathlib

        cache = pathlib.Path.home() / ".cache" / "tudocomp_tpu" / "jax_cache"
        cache.mkdir(parents=True, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", str(cache))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass


@lru_cache(maxsize=1)
def accelerator_backend() -> str | None:
    """The default JAX backend if it is an accelerator, else None.

    Importing jax initializes the backend; cache the answer (it cannot
    change within a process).
    """
    if os.environ.get("TDC_NO_DEVICE") == "1":
        return None
    try:
        import jax

        backend = jax.default_backend()
    except Exception:
        return None
    return backend if backend not in ("cpu",) else None


@lru_cache(maxsize=1)
def tunnel_backend() -> bool:
    """True when the accelerator is reached through a remote tunnel (the
    experimental "axon" relay): host<->device transfers then ride a
    network link, so stages whose output must land in host memory pay a
    transfer cost that does not exist on a locally attached TPU. Gates
    that win on-device but lose on the fetch (e.g. the 0.227 GB/s
    bit-serial Huffman decode, 3x the host decoder data-resident, but
    tunnel-transfer-bound end-to-end) stay host-side behind a tunnel and
    open on local TPUs.

    Detection: the axon plugin registers as plain "tpu" — the relay is
    only visible in the client's platform_version string (and in the
    plugin module name), so check those."""
    if accelerator_backend() is None:
        return False
    try:
        import jax

        if jax.default_backend() == "axon":
            return True
        dev = jax.devices()[0]
        pv = str(getattr(dev.client, "platform_version", ""))
        return "axon" in pv.lower()
    except Exception:
        return False


def use_device(env_var: str, min_n: int = 0, n: int | None = None) -> bool:
    """Should this stage run on device?

    Explicit env overrides win; otherwise device iff an accelerator is the
    default backend and the problem size reaches min_n (tiny inputs are
    dominated by dispatch latency).
    """
    v = os.environ.get(env_var)
    if v == "1":
        return True
    if v == "0":
        return False
    if accelerator_backend() is None:
        return False
    if n is not None and n < min_n:
        return False
    return True
