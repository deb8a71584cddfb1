"""Cross-engine deterministic aggregation helpers.

Why: the driver compares Spark results to DuckDB by value hash. Double
sums are order-dependent (Spark's parallel partial aggregation vs
DuckDB's sequential scan), and ``round()`` CANNOT reconcile them — the
two engines even round exact decimal midpoints differently (Spark rounds
the shortest decimal representation half-up; DuckDB rounds the binary
value). Observed live: a single CSV value 1.01605 → 1.0161 (Spark) vs
1.016 (DuckDB).

Policy instead of rounding:

- **Sums of doubles**: cast each addend to DECIMAL first. Decimal sums
  are exact and order-independent, so both engines agree bit-for-bit;
  cast the final sum back to DOUBLE (exact for our magnitudes).
  Source values are fixed-point decimals (prices with ≤2 dp, CSV bars
  with ≤8 dp), so the cast is lossless; products of 2-dp factors stay
  within 6 dp.
- **Averages / ratios**: divide the two deterministic values as DOUBLE —
  IEEE division of identical inputs is identical output.
- **min/max/first/last/lag/lead of raw columns**: emit unrounded; raw
  values parse to identical doubles in both engines.

At 100 TB this costs one decimal conversion per row inside the partial
aggregate — still JVM-codegen'd, no Python involved.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _dec(scale: int) -> str:
    # 18 integer digits regardless of scale; Spark widens the sum type by
    # 10 more digits (capped at 38), so partial sums can't overflow at any
    # realistic scale factor.
    #
    # IMPORTANT: the scale must be ≥ the decimal precision of the source
    # data, so the double→decimal cast is exact (no rounding happens and
    # both engines agree bit-for-bit). If the data has MORE decimals than
    # the scale, the cast rounds — and at midpoints Spark
    # (BigDecimal.valueOf → HALF_UP) and DuckDB (binary rounding) disagree
    # (observed live at scale 8 on 10-dp CSV values). Testdata prices have
    # ≤2 dp (expression products ≤6 dp) → scale 6; the reference CSV
    # corpus has ≤10 dp → scale 12.
    return f"decimal({18 + scale},{scale})"


def dsum(col: Column | str, scale: int = 6) -> Column:
    """Order-independent exact sum of a double column (see module doc)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(_dec(scale))).cast("double")


def davg(col: Column | str, scale: int = 6) -> Column:
    """Deterministic mean: exact decimal sum ÷ count, in double."""
    c = F.col(col) if isinstance(col, str) else col
    return dsum(c, scale) / F.count(c)


def sql_dsum(expr: str, scale: int = 6) -> str:
    """DuckDB-side mirror of :func:`dsum`.

    Both casts hop through VARCHAR to match Spark bit-for-bit:

    - input double→decimal: Spark casts via the double's shortest decimal
      string (BigDecimal.valueOf), recovering the original fixed-point
      text; DuckDB's direct cast rounds the binary value instead, which
      diverges by 1 ulp once the ulp exceeds 10^-scale. VARCHAR formatting
      is shortest-roundtrip in both engines, so text→decimal agrees.
    - output decimal→double: DuckDB's direct cast divides in floating
      point (≈2 ulp off); text→double — like Spark's Decimal.toDouble —
      is correctly rounded.
    """
    return (
        f"CAST(CAST(sum(CAST(CAST(({expr}) AS VARCHAR) AS DECIMAL({18 + scale},{scale})))"
        f" AS VARCHAR) AS DOUBLE)"
    )


def sql_davg(expr: str, scale: int = 6) -> str:
    """DuckDB-side mirror of :func:`davg`."""
    return f"({sql_dsum(expr, scale)} / count({expr}))"
