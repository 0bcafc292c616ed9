"""Pins for the round-12 optimization of the graph-ANN family
(operators/graph_ann.py): the vectorized cogroup edge build and the
one-exchange beam hop must be row-identical to the original
expression-based formulations they replaced.

The oracle sweep pins both against DuckDB at sf0.01; these tests pin
them against the ORIGINAL Spark formulation directly, so a numpy
semantics drift (summation order, tie-break, sentinel handling) is
caught at the operator seam with a readable diff."""

from __future__ import annotations

import os

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from kinesis_producer_spark.operators.graph_ann import (
    nsw_graph,
    nsw_search,
)
from kinesis_producer_spark.operators.similarity import ivf_cell, qdot
from kinesis_producer_spark.tables import load_table

SF = os.environ.get("GRAPH_TEST_SF_DIR", "/root/testdata/sf0.01")


def _nsw_graph_expr(corpus, bits=3, per_cell=2):
    """The pre-optimization build, verbatim: probe-exploded join on the
    cell id, per-pair JVM qdot cosine, (src, pcell) window."""
    probes = [0] + [1 << i for i in range(bits)]
    a = corpus.select(
        F.col("vec_id").alias("src"),
        F.col("embedding").alias("_ea"),
        ivf_cell(F.col("embedding"), bits).alias("_cell"),
        qdot(F.col("embedding"), F.col("embedding")).alias("_na"),
    ).select(
        "src",
        "_ea",
        "_na",
        F.explode(
            F.array(*[F.col("_cell").bitwiseXOR(F.lit(p)) for p in probes])
        ).alias("_pcell"),
    )
    b = corpus.select(
        F.col("vec_id").alias("dst"),
        F.col("embedding").alias("_eb"),
        ivf_cell(F.col("embedding"), bits).alias("_pcell"),
        qdot(F.col("embedding"), F.col("embedding")).alias("_nb"),
    )
    cos = F.floor(
        F.lit(1e6)
        * qdot(F.col("_ea"), F.col("_eb")).cast("double")
        / F.sqrt(F.col("_na").cast("double") * F.col("_nb").cast("double"))
        + F.lit(0.5)
    ).cast("bigint")
    w = W.partitionBy("src", "_pcell").orderBy(F.col("_cm").desc(), F.col("dst"))
    return (
        a.join(b, "_pcell")
        .where(F.col("dst") != F.col("src"))
        .select("src", "dst", "_pcell", cos.alias("_cm"))
        .withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= per_cell)
        .select("src", "dst")
    )


def test_vectorized_graph_build_matches_expression_build(spark):
    e = load_table(spark, SF, "embeddings")
    got = sorted(map(tuple, nsw_graph(e, bits=3, per_cell=2).collect()))
    want = sorted(map(tuple, _nsw_graph_expr(e, bits=3, per_cell=2).collect()))
    assert got == want
    # sanity on shape: every node emits >= 1 and <= 4*per_cell edges
    srcs = {s for s, _ in got}
    assert len(srcs) == e.count()


def test_one_exchange_hop_matches_distinct_row_number_hop(spark):
    """The dense_rank + dropDuplicates hop must select exactly the set
    the original distinct() + row_number hop selected, every hop —
    pinned end to end by equality of the final beam search output."""
    e = load_table(spark, SF, "embeddings")
    g = nsw_graph(e, bits=3, per_cell=2).localCheckpoint(eager=True)

    # reference walk: the original per-hop algebra, small enough here
    # to run without the lineage optimizations
    qs = e.filter(F.col("vec_id").isin([1, 2, 3])).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("_qe"),
        qdot(F.col("embedding"), F.col("embedding")).alias("_nq"),
    )
    nodes = e.select(
        F.col("vec_id").alias("_nid"),
        F.col("embedding").alias("_ne"),
        qdot(F.col("embedding"), F.col("embedding")).alias("_nn"),
    )
    cos = F.floor(
        F.lit(1e6)
        * qdot(F.col("_qe"), F.col("_ne")).cast("double")
        / F.sqrt(F.col("_nq").cast("double") * F.col("_nn").cast("double"))
        + F.lit(0.5)
    ).cast("bigint")

    def score(cand):
        return (
            cand.join(nodes, cand["vec_id"] == nodes["_nid"])
            .join(F.broadcast(qs), "query_id")
            .select("query_id", "vec_id", cos.alias("cos_micro"))
        )

    entry = e.agg(F.min("vec_id")).collect()[0][0]
    frontier = qs.select("query_id", F.lit(entry).cast("long").alias("vec_id"))
    w = W.partitionBy("query_id").orderBy(F.col("cos_micro").desc(), F.col("vec_id"))
    for _ in range(4):
        neighbors = frontier.join(g, frontier["vec_id"] == g["src"]).select(
            "query_id", F.col("dst").alias("vec_id")
        )
        cand = frontier.select("query_id", "vec_id").union(neighbors).distinct()
        frontier = (
            score(cand)
            .withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") <= 8)
            .select("query_id", "vec_id")
            .localCheckpoint(eager=True)
        )
    want = sorted(
        map(
            tuple,
            score(frontier)
            .withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= 5)
            .select("query_id", "vec_id", "cos_micro", "rank")
            .collect(),
        )
    )

    got = sorted(
        map(
            tuple,
            nsw_search(e, g, query_ids=[1, 2, 3], hops=4, beam=8, k=5)
            .select("query_id", "vec_id", "cos_micro", F.col("rank").cast("int"))
            .collect(),
        )
    )
    assert got == want
