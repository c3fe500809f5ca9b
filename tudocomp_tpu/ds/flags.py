"""Text data structure flags (mirror of ds/TextDSFlags.hpp)."""

SA = 1 << 0
ISA = 1 << 1
LCP = 1 << 2
PHI = 1 << 3
PLCP = 1 << 4
