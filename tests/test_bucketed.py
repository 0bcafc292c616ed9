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


def test_bucketed_write_is_idempotent(spark):
    from kinesis_producer_spark.operators.bucketed import bucketed, write_bucketed

    df = spark.range(0, 100).select(F.col("id").alias("k"))
    base = tempfile.mkdtemp()
    write_bucketed(df, "t_bkt_idem", "k", 2, path=f"{base}/t")
    write_bucketed(df, "t_bkt_idem", "k", 2, path=f"{base}/t")  # replace, not append
    assert bucketed(spark, "t_bkt_idem").count() == 100
