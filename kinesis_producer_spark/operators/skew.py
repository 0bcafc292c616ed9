"""Skew- and range-join strategies for 100 TB shapes.

Two operators Catalyst doesn't apply on its own:

- **salted_join**: explicit key-salting for pathologically hot join
  keys. AQE skew splitting (on in session.py) handles most skew by
  splitting oversized *partitions*; salting goes further by splitting
  a single hot *key* across ``salt`` reducers — the left side sprays
  each row to one random-ish salt bucket (deterministic hash of a
  tie-break column, not a true RNG, so results are reproducible), the
  right side is replicated ``salt`` times. Semantics are exactly an
  inner equi-join.

- **binned_range_join**: turns a pure theta (interval-overlap) join
  into an equi-join on a bin id + residual filter. A naive range join
  is a BroadcastNestedLoopJoin — O(n·m) compares; binning bounds each
  row's comparisons to its ±1 bin neighborhood, and the bin id is an
  equi key Spark can hash-partition, so the quadratic never leaves a
  bin. Bin width should be ≳ the typical interval width.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    salt: int = 16,
    left_entropy_col: str | None = None,
) -> DataFrame:
    """Inner equi-join with the key salted ``salt`` ways.

    ``left_entropy_col``: a left column whose hash spreads rows across
    salt buckets (defaults to the first non-key column). The right side
    is exploded ``salt``× — use for dim-sized or pre-filtered rights.
    """
    ent = left_entropy_col or next(c for c in left.columns if c != on)
    l_salted = left.withColumn("_salt", F.pmod(F.hash(F.col(ent)), F.lit(salt)))
    r_salted = right.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    )
    out = l_salted.join(r_salted, [on, "_salt"]).drop("_salt")
    return out


def binned_range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    lo_col: str,
    hi_col: str,
    bin_width: float,
) -> DataFrame:
    """All (point, interval) pairs with ``lo <= point < hi``.

    Each interval is exploded to the bins it overlaps; each point maps
    to exactly one bin; the join is equi on the bin id with the exact
    range predicate as a residual filter. Intervals spanning b bins
    replicate b× — choose ``bin_width`` near the typical interval span.
    """
    p_bin = F.floor(F.col(point_col) / bin_width).cast("bigint")
    lo_bin = F.floor(F.col(lo_col) / bin_width).cast("bigint")
    # over-claim at most one bin when hi sits exactly on a boundary;
    # the exact residual filter removes the false pairs (no epsilon
    # arithmetic — boundaries stay float-exact)
    hi_bin = F.floor(F.col(hi_col) / bin_width).cast("bigint")
    p = points.withColumn("_bin", p_bin)
    iv = intervals.withColumn("_bin", F.explode(F.sequence(lo_bin, hi_bin)))
    return (
        p.join(iv, "_bin")
        .filter((F.col(point_col) >= F.col(lo_col)) & (F.col(point_col) < F.col(hi_col)))
        .drop("_bin")
    )
