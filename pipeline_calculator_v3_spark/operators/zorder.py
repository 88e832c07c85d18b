"""Z-order (Morton) spatial clustering keys — the write-time data-layout
primitive for coordinate data at 100 TB.

A table laid out in z-key order puts spatially-near rows into the same
files, so a bbox query touches a handful of files instead of all of them:
engines with file-statistics pruning (min/max manifests) skip the rest
outright, and even a plain parquet scan benefits from row-group min/max
skipping inside each file.  The reference holds everything in RAM and
needs no layout (SURVEY §1); at cluster scale layout IS the index.

Everything here is pure Column arithmetic (quantize + bit interleave via
shift/mask terms, all inside whole-stage codegen) — no UDF, no shuffle of
its own.  ``cluster_by_zorder`` does one range-repartition + in-partition
sort, the standard price of re-clustering a table.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _quantize(v: Column, lo: float, hi: float, bits: int) -> Column:
    """Map [lo, hi] onto integer cells [0, 2^bits), clamped at both ends."""
    cells = 1 << bits
    cell = F.floor((v - F.lit(lo)) / F.lit(hi - lo) * F.lit(cells))
    return F.greatest(
        F.lit(0).cast("long"),
        F.least(F.lit(cells - 1).cast("long"), cell.cast("long")),
    )


def zorder_key(lat: Column, lon: Column, bits: int = 16) -> Column:
    """Morton key interleaving ``bits`` quantized bits of lat and lon
    (lon in the even positions, lat in the odd) — a BIGINT usable as a
    sort/cluster/range-partition key.  2*bits <= 62."""
    if not 1 <= bits <= 31:
        raise ValueError(f"bits must be in [1, 31], got {bits}")
    qlat = _quantize(lat, -90.0, 90.0, bits)
    qlon = _quantize(lon, -180.0, 180.0, bits)
    terms = []
    for i in range(bits):
        bit_lat = F.shiftright(qlat, i).bitwiseAND(F.lit(1))
        bit_lon = F.shiftright(qlon, i).bitwiseAND(F.lit(1))
        terms.append(F.shiftleft(bit_lon, 2 * i))
        terms.append(F.shiftleft(bit_lat, 2 * i + 1))
    key = reduce(lambda a, b: a.bitwiseOR(b), terms).cast("bigint")
    # NULL/NaN coordinates must yield a NULL key, not a valid corner tile:
    # Spark's least/greatest SKIP null arguments, so the clamp would
    # otherwise park a NULL lat at the max cell and silently pollute that
    # tile's file statistics (review finding, r05)
    inf = float("inf")
    bad = (
        lat.isNull() | lon.isNull() | F.isnan(lat.cast("double"))
        | F.isnan(lon.cast("double"))
        # +-Infinity sails through floor/clamp to the max/min cell and
        # would pollute a corner tile's statistics exactly like the NULL
        # case the r05 fix quarantined (review r06)
        | (F.abs(lat.cast("double")) == F.lit(inf))
        | (F.abs(lon.cast("double")) == F.lit(inf))
    )
    return F.when(bad, F.lit(None).cast("bigint")).otherwise(key)


def cluster_by_zorder(
    df: DataFrame,
    lat_col: str,
    lon_col: str,
    n_partitions: int,
    bits: int = 16,
) -> DataFrame:
    """Re-cluster ``df`` for write: range-partition on the z-key (each
    output file covers a contiguous z-range, i.e. a compact spatial tile)
    and sort within partitions so row-group min/max stats are tight.

    Rows with NULL/NaN coordinates carry a NULL z-key and land together in
    the first range partition — quarantined, not scattered into valid
    tiles.  One shuffle (the range exchange) — the cost every table
    re-clustering pays; downstream bbox scans repay it on every query."""
    if "_zkey" in df.columns:
        raise ValueError("input frame already has a _zkey column")
    keyed = df.withColumn(
        "_zkey", zorder_key(F.col(lat_col), F.col(lon_col), bits)
    )
    return (
        keyed.repartitionByRange(n_partitions, "_zkey")
        .sortWithinPartitions("_zkey")
        .drop("_zkey")
    )
