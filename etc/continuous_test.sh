#!/bin/bash
# Randomized fuzz loop (mirror of etc/continuous_test.sh): roundtrips
# random generator strings through random matrix configs until failure.
#   ./continuous_test.sh [iterations]
set -e
N=${1:-50}
PY=${PYTHON:-python}
$PY - "$N" <<'PYEOF'
import random, sys
sys.path.insert(0, __import__("os").path.dirname(__import__("os").path.dirname(__import__("os").path.abspath(__file__)))) if False else None
from tudocomp_tpu.driver import compress, decompress
from tudocomp_tpu.registry_config import compressor_matrix
from tudocomp_tpu import REGISTRY
import numpy as np

n_iter = int(sys.argv[1])
matrix = compressor_matrix(fast=False)
rng = np.random.default_rng()
for i in range(n_iter):
    cfg = random.choice(matrix)
    kind = random.choice(["random", "runs", "fib"])
    if kind == "random":
        data = rng.integers(0, 256, int(rng.integers(0, 2000))).astype(np.uint8).tobytes()
    elif kind == "runs":
        data = b"".join(bytes([c]) * int(rng.integers(1, 50)) for c in rng.integers(0, 256, 40).astype(np.uint8))
    else:
        a, b = b"b", b"a"
        for _ in range(int(rng.integers(3, 15))): a, b = b, b + a
        data = b
    comp = compress(cfg, data)
    got = decompress(comp)
    assert got == data, (cfg, data[:40])
    print(f"[{i+1}/{n_iter}] {cfg}  n={len(data)} -> {len(comp)}  OK", flush=True)
print("fuzz loop passed")
PYEOF
