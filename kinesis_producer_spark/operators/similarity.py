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
    """Exact cosine top-k per query. ``queries`` must be small (broadcast)."""
    q = queries.select(
        F.col(query_id_col), F.col(emb_col).alias("_q_emb")
    )
    scored = corpus.crossJoin(F.broadcast(q)).select(
        F.col(query_id_col),
        F.col(id_col),
        cosine_micro(F.col(emb_col), F.col("_q_emb")).alias("cos_micro"),
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
    """Approximate top-k probing only the query's coarse cell."""
    cells = corpus.withColumn("_cell", ivf_cell(F.col(emb_col), bits))
    q = queries.select(
        F.col(query_id_col),
        F.col(emb_col).alias("_q_emb"),
        ivf_cell(F.col(emb_col), bits).alias("_cell"),
    )
    scored = cells.join(F.broadcast(q), "_cell").select(
        F.col(query_id_col),
        F.col(id_col),
        cosine_micro(F.col(emb_col), F.col("_q_emb")).alias("cos_micro"),
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
