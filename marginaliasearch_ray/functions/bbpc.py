"""Braille-block punch-card rendering of a positions bitmask — the
search GUI's per-result positions string (UrlDetails.positions).

Bit-faithful port of BrailleBlockPunchCards.printBits
(code/libraries/braille-block-punch-cards/java/nu/marginalia/bbpc/
BrailleBlockPunchCards.java:8-52), called with bits=64 on each result's
best-positions mask (SearchOperator.createDetails:252).

U+2800's eight dots are addressed in legacy 2x6-grid order, so using
the block as a dot matrix needs the reference's bit shuffle:
native bits 0..7 -> braille dots via
``(v & 0x87) | ((v & 0x70) >> 1) | ((v & 0x08) << 3)``.
"""

from __future__ import annotations

BRAILLE_BLOCK_BASE = 0x2800


def _bin2brail(v: int) -> int:
    return (v & 0x87) | ((v & 0x70) >> 1) | ((v & 0x08) << 3)


def print_bits(val: int, bits: int = 64) -> str:
    """One braille char per 8 bits, least-significant byte first —
    byte-for-byte the reference's StringBuilder loop (Java ``>>>``
    semantics: the int64 mask is treated as unsigned)."""
    val &= (1 << 64) - 1  # Java >>> on long
    out = []
    for _ in range(0, bits, 8):
        out.append(chr(BRAILLE_BLOCK_BASE + _bin2brail(val & 0xFF)))
        val >>= 8
    return "".join(out)
