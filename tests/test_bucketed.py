"""Bucketed-table layout: the join must plan with zero exchanges."""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F


def test_bucketed_join_has_no_shuffle(spark):
    from kinesis_producer_spark.operators.bucketed import (
        bucketed,
        n_shuffle_exchanges,
        write_bucketed,
    )

    left = spark.range(0, 10000).select(
        F.col("id").alias("k"), (F.col("id") % 13).alias("a")
    )
    right = spark.range(0, 10000, 2).select(
        F.col("id").alias("k2"), (F.col("id") % 7).alias("b")
    )
    base = tempfile.mkdtemp()
    write_bucketed(left, "t_bkt_left", "k", 4, path=f"{base}/l")
    write_bucketed(right, "t_bkt_right", "k2", 4, path=f"{base}/r")
    bl, br = bucketed(spark, "t_bkt_left"), bucketed(spark, "t_bkt_right")
    joined = bl.join(br, bl["k"] == br["k2"])
    # co-located buckets: sort-merge join with NO exchange on either side
    assert n_shuffle_exchanges(joined) == 0
    assert joined.count() == 5000
    # same join on unbucketed frames shuffles (or broadcasts); force
    # SMJ shape by disabling broadcast to make the contrast explicit
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plain = left.join(right, left["k"] == right["k2"])
        assert n_shuffle_exchanges(plain) >= 2
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_bucketed_join_zero_exchanges_survives_aqe_final_plan(spark):
    """AQE may re-plan at runtime (skew-join splits re-introduce
    exchanges), so the zero-exchange claim must hold in the FINAL
    adaptive plan after execution, with every AQE feature on — not just
    in the initial plan."""
    from kinesis_producer_spark.operators.bucketed import (
        bucketed,
        n_shuffle_exchanges,
        write_bucketed,
    )

    left = spark.range(0, 20000).select(
        F.col("id").alias("k"), (F.col("id") % 13).alias("a")
    )
    right = spark.range(0, 20000, 2).select(
        F.col("id").alias("k2"), (F.col("id") % 7).alias("b")
    )
    base = tempfile.mkdtemp()
    write_bucketed(left, "t_bkt_aqe_l", "k", 4, path=f"{base}/l")
    write_bucketed(right, "t_bkt_aqe_r", "k2", 4, path=f"{base}/r")
    assert spark.conf.get("spark.sql.adaptive.enabled") == "true"
    overrides = {
        "spark.sql.adaptive.coalescePartitions.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.localShuffleReader.enabled": "true",
        "spark.sql.adaptive.optimizeSkewsInRebalancePartitions.enabled": "true",
        # keep it an SMJ so AQE can't sidestep the question by broadcasting
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    old = {k: spark.conf.get(k, None) for k in overrides}
    try:
        for k, v in overrides.items():
            spark.conf.set(k, v)
        bl, br = bucketed(spark, "t_bkt_aqe_l"), bucketed(spark, "t_bkt_aqe_r")
        joined = bl.join(br, bl["k"] == br["k2"])
        assert n_shuffle_exchanges(joined, final=True) == 0
        assert joined.count() == 10000
    finally:
        for k, v in old.items():
            spark.conf.set(k, v) if v is not None else spark.conf.unset(k)


def test_bucket_pruning_point_lookup_scans_one_bucket(spark):
    """A literal equality filter on the bucket key must prune the scan
    to ONE bucket's files (SelectedBucketsCount: 1 out of N) — the
    point-lookup payoff of the layout at 100 TB."""
    from kinesis_producer_spark.operators.bucketed import (
        bucketed,
        selected_buckets,
        write_bucketed,
    )

    df = spark.range(0, 10000).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("v")
    )
    base = tempfile.mkdtemp()
    write_bucketed(df, "t_bkt_prune", "k", 8, path=f"{base}/t")
    # autoBucketedScan drops the bucketed layout (and with it, pruning)
    # when no operator needs the hash distribution — a filter-only scan
    # qualifies, so pin the bucketed scan on for point lookups
    spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
    try:
        t = bucketed(spark, "t_bkt_prune")

        got = t.where(F.col("k") == 4242)
        assert selected_buckets(got) == (1, 8)
        assert [(r.k, r.v) for r in got.collect()] == [(4242, 12726)]

        # IN-list prunes to at most the distinct key count of buckets
        got3 = t.where(F.col("k").isin(1, 2, 3))
        sel = selected_buckets(got3)
        assert sel is not None and sel[0] <= 3 and sel[1] == 8
        assert got3.count() == 3

        # no filter → no pruning annotation or full bucket count
        full = selected_buckets(t)
        assert full is None or full[0] == 8
    finally:
        spark.conf.unset("spark.sql.sources.bucketing.autoBucketedScan.enabled")


def test_bucketed_write_is_idempotent(spark):
    from kinesis_producer_spark.operators.bucketed import bucketed, write_bucketed

    df = spark.range(0, 100).select(F.col("id").alias("k"))
    base = tempfile.mkdtemp()
    write_bucketed(df, "t_bkt_idem", "k", 2, path=f"{base}/t")
    write_bucketed(df, "t_bkt_idem", "k", 2, path=f"{base}/t")  # replace, not append
    assert bucketed(spark, "t_bkt_idem").count() == 100
