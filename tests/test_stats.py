"""StatPhase: default-on per-phase heap tracking + Charter JSON schema.

Parity target: the reference's malloc-override heap accounting
(src/tudocomp_stat/malloc.cpp:24-84) feeding PhaseData's memOff/memPeak/
memFinal columns (include/tudocomp_stat/PhaseData.hpp:66-111).
"""

import json

import numpy as np
import pytest

from tudocomp_tpu.stats.phase import StatPhase


@pytest.fixture(autouse=True)
def _track_memory():
    old = StatPhase.track_memory
    StatPhase.track_memory = True
    yield
    StatPhase.track_memory = old


def test_phase_tree_and_stats():
    with StatPhase("root") as root:
        root.log("k", "v")
        with StatPhase("a"):
            pass
        with StatPhase("b") as b:
            b.log("n", 3)
    d = root.to_dict()
    assert d["title"] == "root"
    assert [c["title"] for c in d["sub"]] == ["a", "b"]
    assert {"key": "k", "value": "v"} in d["stats"]
    assert d["timeEnd"] >= d["timeStart"]
    json.loads(root.to_json())


def test_memory_columns_present_and_tracking():
    # a 4 MiB allocation inside a child phase must show up in the child's
    # and the parent's memPeak, and be released by phase end (memFinal)
    with StatPhase("root") as root:
        with StatPhase("child") as ch:
            x = np.zeros(1 << 22, np.uint8)
            assert x is not None
            del x
    d = root.to_dict()
    child = d["sub"][0]
    for key in ("memOff", "memPeak", "memFinal"):
        assert key in child and key in d
    if StatPhase.track_memory:
        assert child["memPeak"] >= (1 << 22)
        assert d["memPeak"] >= (1 << 22)
        assert abs(child["memFinal"]) < (1 << 21)


def test_nested_peak_propagates_across_siblings():
    # the second sibling's allocations must not erase the peak the first
    # sibling handed to the parent
    with StatPhase("root") as root:
        with StatPhase("big"):
            x = np.zeros(1 << 22, np.uint8)
            del x
        with StatPhase("small"):
            y = np.zeros(1 << 10, np.uint8)
            del y
    if StatPhase.track_memory:
        assert root.to_dict()["memPeak"] >= (1 << 22)


def test_split():
    with StatPhase("root") as root:
        ph = StatPhase("one")
        ph.__enter__()
        ph = ph.split("two")
        ph.__exit__()
    assert [c["title"] for c in root.to_dict()["sub"]] == ["one", "two"]


def test_malloc_hook_cli_stats():
    """TDC_MALLOC_HOOK=1 re-execs the CLI with the native malloc
    interposer (byte-accurate heap columns, the reference's malloc.cpp
    analogue). Skipped when gcc cannot build the hook."""
    import json
    import os
    import subprocess
    import sys

    from tudocomp_tpu.native import memhook_so_path

    if not memhook_so_path():
        import pytest

        pytest.skip("malloc hook unavailable")
    env = dict(os.environ)
    env["TDC_MALLOC_HOOK"] = "1"
    env.setdefault("PYTHONPATH", os.path.dirname(os.path.dirname(__file__)))
    proc = subprocess.run(
        [sys.executable, "-m", "tudocomp_tpu", "-a", "rle:encode(huff)",
         "-s", "--usestdin", "-o", "/dev/null", "-f"],
        input=b"malloc hook stats " * 200,
        capture_output=True,
        env=env,
        timeout=240,
    )
    assert proc.returncode == 0, proc.stderr[-1500:]
    doc = json.loads(proc.stdout.decode())
    assert doc["data"]["memPeak"] > 0
