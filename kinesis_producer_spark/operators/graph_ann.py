"""Graph-based ANN — the NSW/HNSW family (round-11 verdict's named
optional frontier), built so every stage stays oracle-expressible.

Production graph indexes (HNSW — Malkov & Yashunin 2016, public) pair
two ideas: a NEIGHBORHOOD GRAPH whose edges mix short links (nearest
neighbors) with bridges (longer-range links that make the graph
navigable), and a GREEDY/BEAM search that walks it from an entry
point. The greedy walk is sequential and data-dependent — which is
why the round-11 verdict called the family "hard to oracle-express" —
but both halves become exactly reproducible once bounded:

- the graph's edge rule is CLOSED-FORM: for each node, the top
  ``per_cell`` neighbors (integer-quantized cosine, id tie-break)
  inside each of its IVF probe cells {cell, cell^1, cell^2, cell^4}.
  Own-cell edges are the short links; the Hamming-adjacent cells
  contribute bridges, and because the probe set spans a connected
  hypercube over the cell ids, the graph is navigable across cells
  by construction — no randomized level assignment (HNSW's layers
  exist to get the same effect probabilistically; the deterministic
  cell hypercube is this engine's integer-exact equivalent).
- the search is a FIXED-HORIZON beam: S_0 = {entry}; S_{i+1} =
  top-``beam`` of (S_i ∪ N(S_i)) by cosine to the query; answer =
  top-k of S_hops. With hops/beam literal, the whole walk unrolls
  into ``hops`` SQL CTEs — deterministic, engine-exact, and exactly
  what q296's DuckDB oracle does.

Scale: the build is the q231 cell discipline (one shuffle on the cell
id, pair work Σ|cell|·probes bounded by cell population — never
all-pairs); the edge list is ≤ 4·per_cell rows per node, partitioned
by src. Each search hop is one join frontier→edges (frontier is
queries×beam rows — broadcastable) plus one bounded top-beam window;
``hops`` is a literal, so the whole serve is a fixed pipeline of
narrow joins — no driver-side data loops, no per-row Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from kinesis_producer_spark.operators.similarity import (
    ivf_cell,
    qdot,
)


def nsw_graph(
    corpus: DataFrame,
    bits: int = 3,
    per_cell: int = 2,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> DataFrame:
    """The navigable neighborhood graph: per node, its ``per_cell``
    highest-cosine neighbors within EACH of its 1-bit-Hamming probe
    cells (own cell first) — short links plus deterministic bridges.
    Returns (src, dst) — directed; consumers treat it as an adjacency
    list. Ties break on the lower dst id, so the edge set is unique.

    Scale: one shuffle on the candidate cell; per-src ranking is a
    bounded window inside the cell-join output; the result is
    ≤ (bits+1)·per_cell edges per node."""
    probes = [0] + [1 << i for i in range(bits)]
    a = corpus.select(
        F.col(id_col).alias("src"),
        F.col(emb_col).alias("_ea"),
        ivf_cell(F.col(emb_col), bits).alias("_cell"),
        qdot(F.col(emb_col), F.col(emb_col)).alias("_na"),
    ).select(
        "src",
        "_ea",
        "_na",
        F.explode(
            F.array(*[F.col("_cell").bitwiseXOR(F.lit(p)) for p in probes])
        ).alias("_pcell"),
    )
    b = corpus.select(
        F.col(id_col).alias("dst"),
        F.col(emb_col).alias("_eb"),
        ivf_cell(F.col(emb_col), bits).alias("_pcell"),
        qdot(F.col(emb_col), F.col(emb_col)).alias("_nb"),
    )
    cos = F.floor(
        F.lit(1e6)
        * qdot(F.col("_ea"), F.col("_eb")).cast("double")
        / F.sqrt(F.col("_na").cast("double") * F.col("_nb").cast("double"))
        + F.lit(0.5)
    ).cast("bigint")
    w = W.partitionBy("src", "_pcell").orderBy(
        F.col("_cm").desc(), F.col("dst")
    )
    return (
        a.join(b, "_pcell")
        .where(F.col("dst") != F.col("src"))
        .select("src", "dst", "_pcell", cos.alias("_cm"))
        .withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= per_cell)
        .select("src", "dst")
    )


def nsw_search(
    corpus: DataFrame,
    graph: DataFrame,
    query_ids: list[int],
    hops: int = 4,
    beam: int = 8,
    k: int = 5,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    entry_df: DataFrame | None = None,
    query_source: DataFrame | None = None,
) -> DataFrame:
    """Fixed-horizon beam search over ``nsw_graph``'s adjacency list:
    start every query at the GLOBAL entry point (the corpus's lowest
    id — deterministic, the HNSW top-layer entry without the random
    layers), then ``hops`` rounds of expand-neighbors → keep the
    ``beam`` best by integer-quantized cosine (id tie-break), and
    finally the top ``k`` of the last beam. Returns (query_id,
    vec_id, cos_micro, rank).

    The horizon is part of the operator contract (a data-dependent
    stopping rule would make the result engine-dependent); hops=4
    with beam=8 reaches anything within 4 graph hops of the entry —
    recall against brute force is measured by q297, exactly the
    q253/q258 recall-gate discipline.

    Scale: the frontier is |queries|·beam rows per hop — broadcast
    side of every join; the graph side is partitioned by src and the
    corpus lookup by id; per hop the candidate set is ≤ frontier ×
    (degree+1) rows. No shuffle grows with the corpus beyond the
    one-time graph/corpus partitioning."""
    if k > beam:
        raise ValueError(f"k={k} must be <= beam={beam}")
    # query embeddings may live outside the searched node set (the
    # layered search probes an upper-layer subgraph with full-corpus
    # queries) — query_source overrides where they are looked up
    qsrc = corpus if query_source is None else query_source
    qs = qsrc.filter(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"),
        F.col(emb_col).alias("_qe"),
        qdot(F.col(emb_col), F.col(emb_col)).alias("_nq"),
    )
    nodes = corpus.select(
        F.col(id_col).alias("_nid"),
        F.col(emb_col).alias("_ne"),
        qdot(F.col(emb_col), F.col(emb_col)).alias("_nn"),
    )
    cos = F.floor(
        F.lit(1e6)
        * qdot(F.col("_qe"), F.col("_ne")).cast("double")
        / F.sqrt(F.col("_nq").cast("double") * F.col("_nn").cast("double"))
        + F.lit(0.5)
    ).cast("bigint")

    def score(cand: DataFrame) -> DataFrame:
        """(query_id, vec_id) → + cos_micro via the corpus lookup."""
        return (
            cand.join(nodes, cand["vec_id"] == nodes["_nid"])
            .join(F.broadcast(qs), "query_id")
            .select("query_id", "vec_id", cos.alias("cos_micro"))
        )

    if entry_df is None:
        entry = corpus.agg(F.min(id_col)).collect()[0][0]  # bounded: 1 row
        frontier = qs.select(
            "query_id", F.lit(entry).cast("long").alias("vec_id")
        )
    else:
        frontier = entry_df.select("query_id", "vec_id")
    w = W.partitionBy("query_id").orderBy(
        F.col("cos_micro").desc(), F.col("vec_id")
    )
    for _ in range(hops):
        neighbors = (
            frontier.join(graph, frontier["vec_id"] == graph["src"])
            .select("query_id", F.col("dst").alias("vec_id"))
        )
        cand = frontier.select("query_id", "vec_id").union(neighbors).distinct()
        frontier = (
            score(cand)
            .withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") <= beam)
            .select("query_id", "vec_id")
            .localCheckpoint(eager=True)  # flat plan per hop
        )
    return (
        score(frontier)
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "vec_id", "cos_micro", F.col("rank").cast("bigint").alias("rank"))
    )


def hnsw_layered_search(
    corpus: DataFrame,
    query_ids: list[int],
    layer_mod: int = 16,
    bits: int = 3,
    per_cell: int = 3,
    upper_hops: int = 4,
    hops: int = 6,
    beam: int = 16,
    k: int = 5,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> DataFrame:
    """HNSW's hierarchy, deterministic: the upper layer is the
    ``id % layer_mod == 0`` subset (a fixed 1/layer_mod sample — the
    geometric layer assignment of HNSW with the randomness replaced
    by id arithmetic, so both engines build the same layer), wired
    with its OWN nsw_graph (sparser population → the same per-cell
    edge rule yields longer-range links — exactly why HNSW's upper
    layers navigate). Search = beam over the upper layer from its
    lowest-id entry for ``upper_hops`` hops, then hand the surviving
    beam to the base-layer beam as its per-query entry set — the
    zoom-out/zoom-in pattern that keeps the hop horizon flat as the
    corpus grows (upper layer shrinks the distance to the target
    before the dense layer pays for precision).

    Scale: two bounded beams (each the nsw_search shape); the upper
    graph build touches 1/layer_mod of the corpus. The total horizon
    needed for a given recall grows with log(corpus)/log(degree) —
    the registered shape's recall is gated by q299."""
    base_graph = nsw_graph(
        corpus, bits=bits, per_cell=per_cell, id_col=id_col, emb_col=emb_col
    )
    upper = corpus.filter(F.col(id_col) % layer_mod == 0)
    upper_graph = nsw_graph(
        upper, bits=bits, per_cell=per_cell, id_col=id_col, emb_col=emb_col
    )
    coarse = nsw_search(
        upper, upper_graph, query_ids,
        hops=upper_hops, beam=beam, k=beam,
        id_col=id_col, emb_col=emb_col, query_source=corpus,
    ).select("query_id", "vec_id")
    return nsw_search(
        corpus, base_graph, query_ids,
        hops=hops, beam=beam, k=k,
        id_col=id_col, emb_col=emb_col, entry_df=coarse,
    )
