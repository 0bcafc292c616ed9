"""Embedding similarity search (ANN) over ``array<float>`` columns.

Engine-portable exact math: per-element products are quantized to
integer picounits (``floor(a·b·10¹² + 0.5)``) and summed exactly, so
Spark and the DuckDB oracle produce bit-identical scores regardless of
summation order (same scheme as functions.dsum). Final cosine is
reported in integer micro-units.

Scale path:
- **brute force**: one broadcast of the (tiny) query set, one pass
  over the corpus, per-partition top-k via window — O(N·d·Q), fully
  parallel, no shuffle of the corpus beyond the final top-k.
- **IVF-style**: a deterministic coarse quantizer (sign bits of the
  leading dimensions) partitions the corpus; a query probes only its
  own cell — the classic inverted-file trade of recall for a
  ``2^bits``-fold scan reduction. On a real 100 TB corpus the cell id
  becomes a partition column so Catalyst prunes files by cell.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F

PICO = 1e12


def qdot(a: Column, b: Column) -> Column:
    """Exact quantized dot product of two float-array columns → BIGINT."""
    prods = F.zip_with(
        a,
        b,
        lambda x, y: F.floor(x.cast("double") * y.cast("double") * PICO + F.lit(0.5)).cast(
            "bigint"
        ),
    )
    return F.aggregate(prods, F.lit(0).cast("bigint"), lambda acc, p: acc + p)


def cosine_micro(a: Column, b: Column) -> Column:
    """⌊10⁶·cos(a,b)+0.5⌋ from quantized dot products."""
    num = qdot(a, b).cast("double")
    den = F.sqrt(qdot(a, a).cast("double") * qdot(b, b).cast("double"))
    return F.floor(F.lit(1e6) * num / den + F.lit(0.5)).cast("bigint")


def _cos_from_parts(a_col: str, b_col: str, na_col: str, nb_col: str) -> Column:
    """cosine_micro with PRE-COMPUTED self-norm columns — the same
    deterministic integer/double expression, with qdot(x,x) hoisted to
    each side's projection (bit-identical; see semantic_dedup_keep_list)."""
    return F.floor(
        F.lit(1e6)
        * qdot(F.col(a_col), F.col(b_col)).cast("double")
        / F.sqrt(F.col(na_col).cast("double") * F.col(nb_col).cast("double"))
        + F.lit(0.5)
    ).cast("bigint")


def ivf_cell(emb: Column, bits: int = 2) -> Column:
    """Coarse quantizer: sign bits of the first ``bits`` dimensions."""
    cell = F.lit(0)
    for i in range(bits):
        cell = cell + F.when(F.element_at(emb, i + 1) > 0, F.lit(1 << i)).otherwise(F.lit(0))
    return cell.cast("int")


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact cosine top-k per query. ``queries`` must be small (broadcast).

    Self-norms are hoisted into each side's projection (bit-identical
    to the per-pair form — the q231 discipline), so per pair the work
    is one quantized dot instead of three."""
    q = queries.select(
        F.col(query_id_col),
        F.col(emb_col).alias("_q_emb"),
        qdot(F.col(emb_col), F.col(emb_col)).alias("_nq"),
    )
    c = corpus.select(
        F.col(id_col),
        F.col(emb_col).alias("_c_emb"),
        qdot(F.col(emb_col), F.col(emb_col)).alias("_nc"),
    )
    scored = c.crossJoin(F.broadcast(q)).select(
        F.col(query_id_col),
        F.col(id_col),
        _cos_from_parts("_c_emb", "_q_emb", "_nc", "_nq").alias("cos_micro"),
    )
    w = W.partitionBy(query_id_col).orderBy(F.col("cos_micro").desc(), F.col(id_col))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    bits: int = 2,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Approximate top-k probing only the query's coarse cell.

    Self-norms hoisted as in ``brute_force_topk``."""
    cells = corpus.select(
        F.col(id_col),
        F.col(emb_col).alias("_c_emb"),
        ivf_cell(F.col(emb_col), bits).alias("_cell"),
        qdot(F.col(emb_col), F.col(emb_col)).alias("_nc"),
    )
    q = queries.select(
        F.col(query_id_col),
        F.col(emb_col).alias("_q_emb"),
        ivf_cell(F.col(emb_col), bits).alias("_cell"),
        qdot(F.col(emb_col), F.col(emb_col)).alias("_nq"),
    )
    scored = cells.join(F.broadcast(q), "_cell").select(
        F.col(query_id_col),
        F.col(id_col),
        _cos_from_parts("_c_emb", "_q_emb", "_nc", "_nq").alias("cos_micro"),
    )
    w = W.partitionBy(query_id_col).orderBy(F.col("cos_micro").desc(), F.col(id_col))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def near_dup_pairs(
    df: DataFrame,
    block_col: str = "label",
    threshold_micro: int = 350_000,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> DataFrame:
    """Embedding near-duplicates within blocking groups (id_a < id_b).

    Blocking bounds the pair count (all-pairs only within a block);
    at scale the block column is an LSH bucket or IVF cell rather than
    a label.
    """
    a = df.select(
        F.col(block_col).alias("_blk"), F.col(id_col).alias("id_a"), F.col(emb_col).alias("_ea")
    )
    b = df.select(
        F.col(block_col).alias("_blk"), F.col(id_col).alias("id_b"), F.col(emb_col).alias("_eb")
    )
    return (
        a.join(b, "_blk")
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            cosine_micro(F.col("_ea"), F.col("_eb")).alias("cos_micro"),
        )
        .filter(F.col("cos_micro") >= threshold_micro)
    )


def ivf_topk_multiprobe(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    bits: int = 3,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Multi-probe IVF: probe the query's cell plus every cell at
    Hamming distance 1 (bits+1 probes of 2^bits cells).

    The standard recall fix for coarse quantizers (public multi-probe
    LSH literature, Lv et al. VLDB'07): a query near a quantization
    boundary finds neighbors that landed one sign-flip away, at the
    cost of scanning (bits+1)/2^bits of the corpus instead of 1/2^bits.
    The probe fan-out is on the broadcast query side — the corpus is
    still scanned once, hash-joined on cell id; at 100 TB the cell id
    is a partition column and the probe list prunes files.
    """
    cells = corpus.withColumn("_cell", ivf_cell(F.col(emb_col), bits))
    qc = ivf_cell(F.col(emb_col), bits)
    probes = F.array(qc, *[qc.bitwiseXOR(F.lit(1 << i)) for i in range(bits)])
    q = queries.select(
        F.col(query_id_col),
        F.col(emb_col).alias("_q_emb"),
        F.explode(probes).alias("_cell"),
    )
    scored = cells.join(F.broadcast(q), "_cell").select(
        F.col(query_id_col),
        F.col(id_col),
        cosine_micro(F.col(emb_col), F.col("_q_emb")).alias("cos_micro"),
    )
    w = W.partitionBy(query_id_col).orderBy(F.col("cos_micro").desc(), F.col(id_col))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def semantic_dedup_keep_list(
    corpus: DataFrame,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    bits: int = 3,
    threshold_micro: int = 300_000,
) -> DataFrame:
    """SemDeDup-style semantic dedup (Abbas et al. 2023, public): drop
    every vector that has a LOWER-id semantic near-duplicate in its
    coarse cluster; keep the rest. Returns (id, kept, dup_of) — kept
    flags the survivors, dup_of is the smallest lower-id near-dup for
    dropped rows (NULL for kept), so the output is both the keep-list
    and the removal evidence.

    The cluster is the engine's IVF cell (sign bits of the leading
    dimensions — deterministic, no trained centroids to ship), which
    is exactly SemDeDup's "within k-means cluster" scoping with a
    closed-form quantizer: duplicates are only searched within a cell,
    so the pair space is sum of |cell|² rather than n². Cosine is the
    engine's integer-exact quantized form (oracle-reproducible).

    Scale: one shuffle on the cell id; per-cell pair compare bounded
    by cell population (AQE skew-splits fat cells); the keep decision
    is a min aggregate per id — no iteration, no driver collect. The
    self-norm ``qdot(v,v)`` is computed ONCE PER VECTOR in each side's
    projection (bit-identical to the per-pair form — same
    deterministic integer expression), so the per-pair work is one
    64-dim quantized dot, not three. The probe side fans out to full
    parallelism first (tables.fan_out) — a byte-small corpus arrives
    as one split and would serialize the pair compute on one core;
    at scale the repartition is a no-op.
    """
    from kinesis_producer_spark.tables import fan_out

    a = fan_out(corpus).select(
        F.col(id_col).alias("_ida"),
        F.col(emb_col).alias("_ea"),
        ivf_cell(F.col(emb_col), bits).alias("_cell"),
        qdot(F.col(emb_col), F.col(emb_col)).alias("_na"),
    )
    b = corpus.select(
        F.col(id_col).alias("_idb"),
        F.col(emb_col).alias("_eb"),
        ivf_cell(F.col(emb_col), bits).alias("_cell"),
        qdot(F.col(emb_col), F.col(emb_col)).alias("_nb"),
    )
    cos = F.floor(
        F.lit(1e6)
        * qdot(F.col("_ea"), F.col("_eb")).cast("double")
        / F.sqrt(F.col("_na").cast("double") * F.col("_nb").cast("double"))
        + F.lit(0.5)
    ).cast("bigint")
    dup_pairs = (
        a.join(b, "_cell")
        .where(F.col("_idb") < F.col("_ida"))
        .where(cos >= threshold_micro)
        .groupBy("_ida")
        .agg(F.min("_idb").alias("dup_of"))
    )
    return corpus.select(F.col(id_col)).join(
        dup_pairs.withColumnRenamed("_ida", id_col), id_col, "left"
    ).select(
        id_col,
        F.col("dup_of").isNull().alias("kept"),
        "dup_of",
    )


def _dim_micro(df: DataFrame, id_col: str, emb_col: str, m_dims: int) -> DataFrame:
    """Per-dimension micro-quantized view: (vec_id, m, d, vm) where m
    is the subspace index (``dim div m_dims``), d the offset inside it,
    and vm = ⌊10⁶·value + 0.5⌋ — the integer domain every PQ distance
    below lives in (cross-engine exact)."""
    return df.select(
        F.col(id_col).alias("vec_id"),
        F.posexplode(F.col(emb_col)).alias("i", "v"),
    ).select(
        "vec_id",
        F.expr(f"i div {m_dims}").cast("int").alias("m"),
        (F.col("i") % m_dims).cast("int").alias("d"),
        F.floor(F.lit(1e6) * F.col("v").cast("double") + F.lit(0.5))
        .cast("bigint")
        .alias("vm"),
    )


def pq_codes_and_adc_topk(
    corpus: DataFrame,
    query_ids: list[int],
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    n_centroids: int = 16,
    m_dims: int = 8,
    k: int = 10,
) -> DataFrame:
    """Product-quantization ANN with asymmetric distance computation
    (Jégou et al. 2011, public): split every vector into subspaces of
    ``m_dims`` dims, assign each subvector to its nearest of
    ``n_centroids`` codebook entries (squared L2 in the micro-int
    domain, ties to the lowest centroid id), then answer top-k per
    query by summing the query's precomputed subspace-distance table
    over each vector's codes — the query never touches raw corpus
    vectors, only codes.

    The codebook is data-derived but closed-form: centroid c of every
    subspace is the subvector of the corpus row with vec_id == c
    (deterministic — no trained k-means to ship; swapping in Lloyd
    rounds changes only the ``cb`` frame). Returns
    (query_id, vec_id, adist_q, rank).

    Scale: the codebook is n_centroids × dim values — broadcast; code
    assignment is one pass over the corpus (broadcast join + map-side
    combinable partial aggregate: the shuffle carries O(n·M·K) tiny
    integer rows, linear in corpus size); the ADC table is
    |queries|·M·K rows — broadcast; the final per-(query, vec) sum
    shuffles O(n·M·|queries|) rows and the top-k compiles to a
    per-query heap. Raw vectors are read exactly once: 100 TB of
    float vectors becomes n·M one-byte codes for every later query —
    the entire point of PQ at scale."""
    dims = _dim_micro(corpus, id_col, emb_col, m_dims)
    cb = (
        dims.filter(F.col("vec_id") < n_centroids)
        .select(
            F.col("vec_id").cast("int").alias("cid"),
            "m",
            "d",
            F.col("vm").alias("cm"),
        )
    )
    diff = F.col("vm") - F.col("cm")
    sd = (
        dims.join(F.broadcast(cb), ["m", "d"])
        .groupBy("vec_id", "m", "cid")
        .agg(F.sum(diff * diff).alias("sd2"))
    )
    codes = (
        sd.groupBy("vec_id", "m")
        .agg(F.min(F.struct(F.col("sd2"), F.col("cid"))).alias("best"))
        .select("vec_id", "m", F.col("best.cid").alias("code"))
    )
    adc = (
        sd.filter(F.col("vec_id").isin(*query_ids))
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("m").alias("qm"),
            F.col("cid").alias("qcid"),
            F.col("sd2").alias("qd2"),
        )
    )
    approx = (
        codes.join(
            F.broadcast(adc),
            (F.col("m") == F.col("qm")) & (F.col("code") == F.col("qcid")),
        )
        .groupBy("query_id", "vec_id")
        .agg(F.sum("qd2").alias("adist_q"))
    )
    w = W.partitionBy("query_id").orderBy(F.col("adist_q").asc(), F.col("vec_id"))
    return (
        approx.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "adist_q", "rank")
    )


def prototypicality_prune(
    corpus: DataFrame,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    bits: int = 4,
    prune_den: int = 4,
) -> DataFrame:
    """Prototypicality-based data pruning (Sorscher et al. 2022,
    public): rank every vector by squared distance to its coarse
    cluster's centroid and DROP the most prototypical 1/``prune_den``
    of each cluster — in the abundant-data regime, easy (central)
    examples teach the least, so the keep-set is the hard tail. The
    cluster is the engine's IVF sign-bit cell (the SemDeDup scoping,
    q231); the centroid is the per-cell per-dim mean in micro-int
    units (one fixed-order double division, then everything stays
    integer). Returns (vec_id, cell, dist2_q, rank, cell_n, kept).

    Scale: the centroid frame is |cells|·dim rows — broadcast back;
    distance is a map-side-combinable per-vector sum; the only
    corpus-sized shuffles are the dim aggregate and the per-cell
    rank (skewed cells are AQE territory; at extreme scale swap the
    exact rank for a two-pass quantile threshold on dist2_q, same
    keep semantics)."""
    cells = corpus.select(
        F.col(id_col).alias("vec_id"),
        F.col(emb_col).alias("emb"),
        ivf_cell(F.col(emb_col), bits).alias("cell"),
    )
    dims = cells.select(
        "vec_id",
        "cell",
        F.posexplode(F.col("emb")).alias("d", "v"),
    ).select(
        "vec_id",
        "cell",
        "d",
        F.floor(F.lit(1e6) * F.col("v").cast("double") + F.lit(0.5))
        .cast("bigint")
        .alias("vm"),
    )
    cen = (
        dims.groupBy("cell", "d")
        .agg(F.sum("vm").alias("s"), F.count(F.lit(1)).alias("n"))
        .select(
            "cell",
            "d",
            F.floor(F.col("s").cast("double") / F.col("n") + F.lit(0.5))
            .cast("bigint")
            .alias("cm"),
        )
    )
    diff = F.col("vm") - F.col("cm")
    d2 = (
        dims.join(F.broadcast(cen), ["cell", "d"])
        .groupBy("vec_id", "cell")
        .agg(F.sum(diff * diff).alias("dist2_q"))
    )
    w = W.partitionBy("cell").orderBy(F.col("dist2_q").asc(), F.col("vec_id"))
    wc = W.partitionBy("cell")
    return (
        d2.withColumn("rank", F.row_number().over(w))
        .withColumn("cell_n", F.count(F.lit(1)).over(wc))
        .select(
            "vec_id",
            "cell",
            "dist2_q",
            "rank",
            "cell_n",
            (F.col("rank") * prune_den > F.col("cell_n")).alias("kept"),
        )
    )
