"""Basket pair generation without a self-join.

The classic "items bought together" shape — every unordered item pair
within a basket — is usually written as a basket-keyed self-join. That
costs two exchanges of the item table plus the join; collecting each
basket once and expanding the combinations IN-ROW with higher-order
functions costs one exchange, and the in-row blowup is bounded by
max(basket size)² (single digits in order-shaped data, so no skew
hazard). Used by the co-purchase graph queries (q129/q144/q150/q162/
q163).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def ordered_item_pairs(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    out: tuple[str, str, str] = ("basket", "i_a", "i_b"),
) -> DataFrame:
    """All unordered distinct-item pairs (a < b) per basket:
    one groupBy(basket) exchange, then an in-row nested-transform
    combination expansion.

    Baskets with fewer than two distinct items emit nothing, guarded
    explicitly — the inner index expression must not be evaluated for
    them (F.sequence counts DOWN past an empty range and element_at
    then throws under ANSI mode). NULL basket keys are dropped before
    grouping: the self-join this replaces is null-unsafe (emits
    nothing for NULL keys), and without the filter groupBy would merge
    every null-keyed row into one giant pseudo-basket — an O(N²)
    single-row blowup that breaks the bounded-fan-out guarantee.
    """
    ppo = (
        df.filter(F.col(basket_col).isNotNull())
        .groupBy(basket_col)
        .agg(F.sort_array(F.collect_set(item_col)).alias("ps"))
    )
    idx = F.sequence(F.lit(1), F.size("ps") - 1)
    pair_structs = F.flatten(
        F.transform(
            idx,
            lambda i: F.transform(
                F.slice(F.col("ps"), i + 1, F.size("ps")),
                lambda q: F.struct(
                    F.element_at(F.col("ps"), i).alias("a"), q.alias("b")
                ),
            ),
        )
    )
    guarded = F.when(F.size("ps") >= 2, pair_structs)  # NULL → explode drops
    return ppo.select(
        F.col(basket_col).alias(out[0]), F.explode(guarded).alias("p")
    ).select(out[0], F.col("p.a").alias(out[1]), F.col("p.b").alias(out[2]))
