"""Z-order (Morton) clustering for data-skipping on multi-column scans.

Parquet row-group min/max stats only prune scans when the data is
CLUSTERED on the filtered columns; sorting on one column destroys
locality on the other. A Z-order curve interleaves the bits of both
quantized dimensions, so range-partitioning on the code gives every row
group a tight bounding box in BOTH columns at once — the lakehouse
data-skipping technique (Delta OPTIMIZE ZORDER, Iceberg sort orders)
expressed here with pure Column arithmetic: quantize, bit-interleave
(shift/and/or chains, whole-stage codegen), repartitionByRange, write.

Everything is deterministic integer math, so the code has an exact SQL
twin (sql_morton_code) for oracle parity.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

Z_BITS = 12          # per-dimension quantization for clustering writes


def quantize(col: Column, lo: float, hi: float, bits: int) -> Column:
    """Clamp to [lo, hi] and quantize to an integer in [0, 2^bits - 1]."""
    top = (1 << bits) - 1
    scaled = F.floor((col - F.lit(lo)) / F.lit(hi - lo) * F.lit(top))
    return (F.greatest(F.lit(0), F.least(F.lit(top), scaled))).cast("long")


def morton_code(x: Column, y: Column, bits: int) -> Column:
    """Bit-interleave two quantized ints: x bit i -> 2i, y bit i -> 2i+1."""
    out = F.lit(0).cast("long")
    for i in range(bits):
        out = out + F.shiftleft(F.shiftright(x, i).bitwiseAND(F.lit(1)), 2 * i)
        out = out + F.shiftleft(F.shiftright(y, i).bitwiseAND(F.lit(1)),
                                2 * i + 1)
    return out


def sql_quantize(expr: str, lo: float, hi: float, bits: int) -> str:
    top = (1 << bits) - 1
    return (f"CAST(GREATEST(0, LEAST({top}, "
            f"FLOOR((({expr}) - ({lo})) / ({hi - lo}) * {top}))) AS BIGINT)")


def sql_morton_code(xe: str, ye: str, bits: int) -> str:
    """The exact SQL twin of morton_code over two quantized expressions."""
    # Every term is fully parenthesized: SQL's << binds LOOSER than +,
    # so an unwrapped "a << 0 + b << 1" chain parses as a << (0+b) << 1.
    terms = []
    for i in range(bits):
        terms.append(f"(((({xe}) >> {i}) & 1) << {2 * i})")
        terms.append(f"(((({ye}) >> {i}) & 1) << {2 * i + 1})")
    return "(" + " + ".join(terms) + ")"


def zorder_write(df: DataFrame, path: str, x: str, y: str,
                 x_range: tuple[float, float], y_range: tuple[float, float],
                 bits: int = Z_BITS, n_files: int = 8,
                 mode: str = "overwrite") -> None:
    """Cluster ``df`` along the Z-curve of (x, y) and write parquet.

    repartitionByRange on the Morton code (range exchange: sampled
    bounds, contiguous curve segments per task) + sortWithinPartitions
    so row groups inside each file stay curve-contiguous too. The code
    column is dropped before writing — it is layout, not data.

    Scale: one range exchange, identical cost to any global sort-write;
    the win is every later scan with predicates on x AND y skipping
    most row groups via footer stats alone.
    """
    zx = quantize(F.col(x), *x_range, bits=bits)
    zy = quantize(F.col(y), *y_range, bits=bits)
    coded = df.withColumn("__z", morton_code(zx, zy, bits))
    (coded.repartitionByRange(n_files, F.col("__z"))
          .sortWithinPartitions("__z")
          .drop("__z")
          .write.mode(mode).parquet(path))
