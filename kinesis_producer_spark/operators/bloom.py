"""Broadcast Bloom-filter join pruning.

The 100 TB pattern: a fact-side scan that will be semi-joined against
a much smaller key set should not shuffle rows that cannot possibly
match. A Bloom filter over the build-side keys, evaluated as a pure
column expression on the probe side, drops the vast majority of
non-matching rows BEFORE the join's exchange — the exact-join that
follows removes the Bloom's false positives, so the final result is
identical to the plain join (no false negatives by construction:
both sides use the same JVM ``xxhash64``).

Spark 3.3+ can inject runtime bloom filters itself
(``spark.sql.optimizer.runtime.bloomFilter.enabled``), but an
explicit operator lets callers size m/k, build once and reuse across
many probe queries, and apply the filter in places the optimizer
won't (e.g. ahead of a UDF stage). Everything here stays JVM-side:
``xxhash64`` + ``getbit`` + ``element_at`` over a literal long-array
— no Python in the hot path; the only driver materialization is the
bit positions of the SMALL side (k·|keys| longs, deduplicated).

Reference parity note: the reference repo
(glinerosuarez/kinesis-producer) has no join engine at all; this is
the scale mandate, built from the public Bloom-filter construction
(Bloom 1970) and Spark's public function surface.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _positions(key: Column, m_bits: int, k: int) -> list[Column]:
    """k bit positions for a key: pmod(xxhash64(key, seed), m). The
    seed rides as a second hashed column, which is how Spark varies
    xxhash64 without a seed parameter."""
    return [
        F.pmod(F.xxhash64(key, F.lit(s)), F.lit(m_bits)) for s in range(k)
    ]


def build_bloom(
    df: DataFrame, key_col: str, m_bits: int = 1 << 16, k: int = 5
) -> list[int]:
    """Build a Bloom bitmap (list of signed 64-bit words, length
    m_bits/64) from the build side's keys. Positions are computed BY
    SPARK with the same xxhash64 the probe side will use, so there
    can be no cross-language hash drift (and thus no false
    negatives). Collects only the distinct bit positions — bounded by
    min(k·|keys|, m_bits) longs, independent of build-side row count."""
    if m_bits % 64:
        raise ValueError("m_bits must be a multiple of 64")
    pos = _positions(F.col(key_col), m_bits, k)
    rows = (
        df.select(F.explode(F.array(*pos)).alias("p"))
        .where(F.col("p").isNotNull())
        .distinct()
        .collect()
    )
    words = [0] * (m_bits // 64)
    for r in rows:
        words[r.p // 64] |= 1 << (r.p % 64)
    # two's-complement to signed so each word fits a Spark LongType literal
    return [w - (1 << 64) if w >= (1 << 63) else w for w in words]


def bloom_might_contain(
    words: list[int], key: Column, m_bits: int | None = None, k: int = 5
) -> Column:
    """Membership test as a pure column expression: true if every one
    of the k hashed bits is set. False positives possible (follow
    with the exact join); false negatives impossible."""
    if m_bits is None:
        m_bits = 64 * len(words)
    arr = F.array(*[F.lit(w) for w in words])
    cond = F.lit(True)
    for p in _positions(key, m_bits, k):
        word = F.element_at(arr, F.shiftright(p, 6).cast("int") + 1)
        cond = cond & (F.getbit(word, p.bitwiseAND(F.lit(63))) == 1)
    return cond


def bloom_semi_join(
    probe: DataFrame,
    build: DataFrame,
    probe_key: str,
    build_key: str,
    m_bits: int = 1 << 16,
    k: int = 5,
) -> DataFrame:
    """Semi-join ``probe`` to ``build`` with a Bloom pre-filter on the
    probe side, then the exact (broadcast) semi-join to kill false
    positives. Result rows are exactly ``probe ⋉ build``; the win is
    that the pre-filter runs inside the probe scan's stage, so at
    scale the exchange (or even the broadcast-hash probe work) sees
    only candidate rows."""
    words = build_bloom(build.select(build_key), build_key, m_bits=m_bits, k=k)
    pruned = probe.where(bloom_might_contain(words, F.col(probe_key), m_bits, k))
    return pruned.join(
        F.broadcast(build.select(build_key).distinct()),
        pruned[probe_key] == F.col(build_key),
        "left_semi",
    )
