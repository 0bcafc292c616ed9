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

    Physical shape (optimization round 12, guide §4.2): the original
    build joined the probe-exploded corpus to the cell-keyed corpus
    and scored every candidate pair with the JVM ``qdot`` expression —
    a zip_with/aggregate HOF lambda evaluated PER PAIR (Σ|cell|·probes
    pairs ≈ 2M at sf0.1), measured ~10 µs/element interpreted: 21 s
    for the sf0.1 build. This build moves the pair scoring into ONE
    Arrow cogroup stage keyed on the probe cell: each side crosses the
    Python boundary ONCE PER NODE-PROBE (never per pair), and the
    |A|×|B| scoring runs as blocked numpy float64 — bit-identical to
    the SQL formula because every step (per-element
    ⌊x·y·10¹²+0.5⌋, exact-integer partial sums < 2⁵³, one IEEE
    divide/sqrt, final floor) is the same IEEE double op in both
    engines; the descending STABLE argsort over a dst-sorted block IS
    the (cos DESC, dst ASC) window tie-break.

    Scale: one shuffle on the candidate cell (unchanged); pair work
    Σ|cell|·probes flops (never all-pairs), blocked to ≤64 MB scratch
    per task; the result is ≤ (bits+1)·per_cell edges per node.
    Parallelism = number of cells, which grows with ``bits`` exactly
    as the IVF family's does."""
    import numpy as np
    import pandas as pd

    probes = [0] + [1 << i for i in range(bits)]
    a = corpus.select(
        F.col(id_col).alias("src"),
        F.col(emb_col).alias("_e"),
        ivf_cell(F.col(emb_col), bits).alias("_cell"),
    ).select(
        "src",
        "_e",
        F.explode(
            F.array(*[F.col("_cell").bitwiseXOR(F.lit(p)) for p in probes])
        ).alias("_pcell"),
    )
    b = corpus.select(
        F.col(id_col).alias("dst"),
        F.col(emb_col).alias("_e"),
        ivf_cell(F.col(emb_col), bits).alias("_pcell"),
    )

    _SENTINEL = -(1 << 62)  # sorts after every real cos; -x never overflows

    def _qnorms(mat: "np.ndarray") -> "np.ndarray":
        # qdot(e, e): per-element ⌊x²·10¹²+0.5⌋ then sum — every floor
        # is an exact integer in float64; accumulating in int64 matches
        # the JVM's bigint summation EXACTLY for any input magnitude
        # (float64 partial sums would only match while < 2⁵³)
        return np.floor(mat * mat * 1e12 + 0.5).astype(np.int64).sum(axis=1)

    def build(a_pdf: "pd.DataFrame", b_pdf: "pd.DataFrame"):
        if len(a_pdf) == 0 or len(b_pdf) == 0:
            return pd.DataFrame(
                {"src": pd.Series(dtype="int64"), "dst": pd.Series(dtype="int64")}
            )
        # dst-ascending order makes the stable argsort's tie-break the
        # window's ORDER BY cos DESC, dst ASC
        b_pdf = b_pdf.sort_values("dst", kind="mergesort")
        dstv = b_pdf["dst"].to_numpy(dtype=np.int64)
        bmat = np.stack([np.asarray(e, dtype=np.float64) for e in b_pdf["_e"]])
        srcv = a_pdf["src"].to_numpy(dtype=np.int64)
        amat = np.stack([np.asarray(e, dtype=np.float64) for e in a_pdf["_e"]])
        nb = _qnorms(bmat)
        na = _qnorms(amat)
        dim = bmat.shape[1]
        # block A so the (block × |B| × dim) scratch stays ≤ ~64 MB
        step = max(1, int(64_000_000 // max(1, len(dstv) * dim * 8)))
        srcs: list["np.ndarray"] = []
        dsts: list["np.ndarray"] = []
        for lo in range(0, len(srcv), step):
            ac, nac, sc = (
                amat[lo : lo + step],
                na[lo : lo + step],
                srcv[lo : lo + step],
            )
            # int64 accumulation = the JVM's bigint sum, exact at any
            # magnitude; 1e6·num then converts to float64 exactly like
            # the JVM's CAST(... AS DOUBLE)
            num = (
                np.floor(ac[:, None, :] * bmat[None, :, :] * 1e12 + 0.5)
                .astype(np.int64)
                .sum(axis=2)
            )
            # same op order as the JVM expression: (1e6 · num) / den
            # norms cast to double BEFORE the product (the JVM's
            # CAST(_nq AS DOUBLE) * CAST(_nn AS DOUBLE) — an int64
            # product would overflow at qnorm² ~ 1e24)
            cos = np.floor(
                (1e6 * num)
                / np.sqrt(
                    nac[:, None].astype(np.float64)
                    * nb[None, :].astype(np.float64)
                )
                + 0.5
            ).astype(np.int64)
            cos[sc[:, None] == dstv[None, :]] = _SENTINEL  # dst != src
            width = min(per_cell, cos.shape[1])
            order = np.argsort(-cos, axis=1, kind="stable")[:, :width]
            picked = np.take_along_axis(cos, order, axis=1)
            keep = (picked != _SENTINEL).ravel()
            srcs.append(np.repeat(sc, width)[keep])
            dsts.append(dstv[order].ravel()[keep])
        return pd.DataFrame(
            {"src": np.concatenate(srcs), "dst": np.concatenate(dsts)}
        )

    return (
        a.groupBy("_pcell")
        .cogroup(b.groupBy("_pcell"))
        .applyInPandas(build, "src long, dst long")
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
    one-time graph/corpus partitioning.

    Physical shape (optimization round 13, guide §2.4/§5): the ENTIRE
    multi-hop walk is ONE lazy plan executed by the consumer's single
    action. Round 12's loop ran one eager localCheckpoint job per hop
    (plus AQE stage-jobs): measured 61 jobs / 91 stages for the 4-hop
    q296 and 105 jobs / 158 stages for q298 — ~90% pure job machinery
    on a ≤|queries|·beam-row frontier. Two structural moves make the
    lazy form viable:

    - SELF-LOOP edges: the hop set S ∪ N(S) needs the frontier twice
      (union + neighbor join), which doubles the plan per hop — the
      round-12 blocker that forced the per-hop checkpoint. Adding one
      (v, v) edge per corpus node to the adjacency list ONCE turns the
      hop into a single frontier→graph join (the self-loop emits the
      frontier row itself, real edges emit the neighbors — the exact
      same candidate multiset), so the frontier is referenced ONCE per
      hop and the plan grows linearly.
    - the graph is still localCheckpoint-ed once (its lineage is the
      expensive cogroup build), but the NODE projection is left lazy:
      inside the one job, every hop's node-lookup join hangs off the
      same exchange subtree, which Spark materializes once and reuses
      (ReusedExchange / AQE stage cache) — no full-corpus
      materialization to executor local disk, and executor loss
      recomputes instead of failing (the round-12 ADVICE hazard).

    The entry point is a broadcast 1-row aggregate folded into the
    plan (no driver collect), and the layered handoff (``entry_df``)
    stays lazy for the same single-reference reason."""
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
    # self-loops: S ∪ N(S) as ONE join (see docstring). Added for every
    # corpus node (not just edge sources) so isolated nodes survive.
    # ONE checkpoint materializes graph+loops together: every hop's
    # probe side is then a single in-memory adjacency scan.
    graph_sl = graph.union(
        corpus.select(
            F.col(id_col).cast("long").alias("src"),
            F.col(id_col).cast("long").alias("dst"),
        )
    ).localCheckpoint(eager=True)
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
        # 1-row broadcast aggregate instead of a blocking driver
        # collect: the entry is part of the lazy plan
        entry = corpus.agg(F.min(F.col(id_col)).cast("long").alias("vec_id"))
        frontier = qs.select("query_id").crossJoin(F.broadcast(entry))
    else:
        frontier = entry_df.select("query_id", "vec_id")
    w = W.partitionBy("query_id").orderBy(
        F.col("cos_micro").desc(), F.col("vec_id")
    )
    for _ in range(hops):
        # one join emits the whole candidate multiset (self-loop row =
        # the frontier member itself, real edges = its neighbors); the
        # multiset is scored WITH duplicates (duplicate rows carry the
        # identical cos), ranked with dense_rank — duplicates tie at
        # the same (cos, vec_id) key, so rank <= beam admits exactly
        # the top-beam DISTINCT candidates — and deduplicated by an
        # aggregate that REUSES the window's hash partitioning
        # (grouping keys ⊇ partition key → no second exchange).
        cand = frontier.join(
            graph_sl, frontier["vec_id"] == graph_sl["src"]
        ).select("query_id", F.col("dst").alias("vec_id"))
        frontier = (
            score(cand)
            .withColumn("_rn", F.dense_rank().over(w))
            .where(F.col("_rn") <= beam)
            .dropDuplicates(["query_id", "vec_id"])
            .select("query_id", "vec_id")
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
