"""Byte-count formatting (reference mack/__init__.py:512-555).

Parity quirks preserved (SURVEY §2c.9):

* threshold is ``n >= 0.9 * k`` — 950 bytes prints ``0.95 kB``;
* the binary variant divides by powers of 1024 but keeps SI labels
  (``kB/MB/...``) — reference tests:730-734 expect ``11.77 MB`` for
  12,345,678 with the binary divisor.
"""

from __future__ import annotations

_SI = 1000
_BIN = 1024
_PREFIXES = ("PB", "TB", "GB", "MB", "kB")


def _humanize(n: int, kilo: int) -> str:
    for i, prefix in enumerate(_PREFIXES):
        k = kilo ** (5 - i)
        if n >= k * 0.9:
            return f"{n / k:.2f} {prefix}"
    return f"{n} B"


def humanize_bytes(n: int) -> str:
    """SI formatting: 1 kB = 1000 B."""
    return _humanize(n, _SI)


def humanize_bytes_binary(n: int) -> str:
    """Binary divisors (1024) with SI labels — intentional reference quirk."""
    return _humanize(n, _BIN)
