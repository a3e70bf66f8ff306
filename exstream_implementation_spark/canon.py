"""Cross-engine decimal canonicalization.

Spark rounds through Java BigDecimal HALF_UP on the shortest decimal
representation of the double; DuckDB rounds the scaled double with half-even
``nearbyint``.  For values landing EXACTLY on a rounding half (dyadic
averages like 8.2/128 = 0.0640625 — common once window/group counts hit
powers of two) the two engines disagree systematically, flipping the
oracle's value hash.  Nudging by +1e-9 before rounding removes exact halves
on both sides; cross-engine pre-round drift is < 1e-12 (measured at a 10×
data replica), three orders below the nudge, so both engines always land on
the same side of the boundary.
"""

from __future__ import annotations

from pyspark.sql import functions as F

STABLE_ROUND_EPS = 1e-9


def stable_round(col, n: int = 6):
    """Spark-side half-boundary-stable round; pair with ``stable_round_sql``
    in the DuckDB oracle for the same column."""
    return F.round(col + F.lit(STABLE_ROUND_EPS), n)


def stable_round_sql(expr: str, n: int = 6) -> str:
    return f"round(({expr}) + 1e-9, {n})"


def md5_hex_threshold(frac: float) -> str:
    """Lexicographic cutoff for a 6-hex-digit md5 prefix: fixed-width
    lowercase hex compares like the number it encodes, and 'g' sorts above
    every hex digit, so frac >= 1.0 keeps everything.  md5 hex is
    bit-identical between Spark and DuckDB, which makes hash-Bernoulli
    sampling oracle-reproducible (used by sample_mix and the flagship's
    instability sampler)."""
    if frac >= 1.0:
        return "g"
    return format(int(frac * 16**6), "06x")


def round_half_up(v: float, n: int = 6) -> float:
    """Driver-side twin of Spark's ``F.round``: HALF_UP on the shortest
    decimal representation of the double (Java BigDecimal.valueOf ≡ Python
    ``repr``).  Python's builtin ``round`` is half-EVEN on the binary value
    and disagrees at exact half boundaries — the same divergence class the
    stable-round nudge fixes cross-engine.  Use this wherever a Python-side
    path must reproduce a Spark-side rounding bit-for-bit."""
    from decimal import ROUND_HALF_UP, Decimal

    return float(
        Decimal(repr(v)).quantize(Decimal(1).scaleb(-n), rounding=ROUND_HALF_UP)
    )
