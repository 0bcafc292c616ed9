"""As-of join — Spark lacks a native one (SURVEY.md §2b "Joins" row).

Scalable formulation: union both sides tagged, one window pass
partitioned by the join key ordered by time, carry the right side's
last-seen values forward with ``last(..., ignorenulls=True)``, then
keep only left rows. Cost = one shuffle on the key + one sort within
partitions — the same cost profile as a sort-merge join, with no
pandas and no per-group materialization, so it survives 100 TB
(each key's history streams through a sorted partition; skewed keys
are split by AQE).

Tie semantics: ``inclusive=True`` means a right row at exactly
``left_ts`` matches (DuckDB ``ASOF JOIN`` / ``c.ts <= p.ts``
semantics). Implemented by sorting right rows *before* left rows at
equal timestamps.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    left_ts: str,
    right_ts: str,
    inclusive: bool = True,
) -> DataFrame:
    """For each left row, attach the latest right row with
    ``right_ts <= left_ts`` (or ``<`` when ``inclusive=False``),
    matching on the equi-key(s) ``on``.

    Right-side value columns (everything except key + ts) come back
    with their own names; the matched timestamp comes back as
    ``right_ts``.
    """
    keys = [on] if isinstance(on, str) else list(on)
    right_vals = [c for c in right.columns if c not in keys and c != right_ts]

    lhs = left.withColumn("__t", F.col(left_ts)).withColumn("__side", F.lit(1))
    rhs = (
        right.select(
            *keys,
            F.col(right_ts).alias("__t"),
            F.lit(0).alias("__side"),
            F.col(right_ts).alias(f"__r_{right_ts}"),
            *[F.col(c).alias(f"__r_{c}") for c in right_vals],
        )
    )
    merged = lhs.unionByName(rhs, allowMissingColumns=True)

    # Right rows sort before left rows at equal __t → inclusive match.
    # For exclusive, left rows sort first so same-instant right rows
    # are not yet visible in the preceding frame.
    side_order = F.col("__side").asc() if inclusive else F.col("__side").desc()
    w = (
        W.partitionBy(*keys)
        .orderBy(F.col("__t").asc(), side_order)
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    carried = [
        F.last(F.col(f"__r_{c}"), ignorenulls=True).over(w).alias(c)
        for c in [right_ts, *right_vals]
    ]
    out = merged.select(*merged.columns, *carried).filter(F.col("__side") == 1)
    return out.drop("__t", "__side", *[f"__r_{c}" for c in [right_ts, *right_vals]])
