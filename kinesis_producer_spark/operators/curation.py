"""Corpus-curation and data-layout operators.

Training-data curation steps that sit beside dedup/sampling in an LLM
pipeline (benchmark decontamination, weighted subset selection) and the
two storage-layout primitives a 100 TB table lives or dies by (Z-order
clustering, zone-map skipping). All pure DataFrame expressions — no
Python in the hot path — each with a DuckDB oracle.

Reference parity: the reference's only layout idea is the Hive
year/month/day prefix (consts.py:8-11, file_flattener.py:157,167);
Z-order and zone maps are the multi-dimensional generalization our
engine adds for scan locality beyond one time axis.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from kinesis_producer_spark.operators.dedup import shingles
from kinesis_producer_spark.registry import query
from kinesis_producer_spark.tables import load_table


@query(
    "q136_ngram_decontamination",
    oracle="""
    WITH w AS (SELECT doc_id, regexp_split_to_array(text, '\\s+') a FROM documents),
    g AS (SELECT doc_id,
                 list_distinct(list_transform(range(1, len(a) - 6), i ->
                   a[i] || ' ' || a[i+1] || ' ' || a[i+2] || ' ' || a[i+3] || ' ' ||
                   a[i+4] || ' ' || a[i+5] || ' ' || a[i+6] || ' ' || a[i+7])) s
          FROM w),
    ex AS (SELECT doc_id, MD5(unnest(s)) AS digest FROM g),
    bench AS (SELECT DISTINCT digest FROM ex WHERE doc_id % 97 = 0),
    train AS (SELECT * FROM ex WHERE doc_id % 97 <> 0)
    SELECT t.doc_id,
           COUNT(*) AS n_grams,
           COUNT(b.digest) AS n_hits,
           CAST(COUNT(b.digest) > 0 AS INTEGER) AS contaminated
    FROM train t LEFT JOIN bench b ON t.digest = b.digest
    GROUP BY t.doc_id
    """,
)
def q136_ngram_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination by word-8-gram overlap — the GPT-3 /
    PaLM recipe: any training document sharing an 8-gram with the held
    -out eval set is flagged. Eval set here = the deterministic
    ``doc_id % 97 == 0`` slice of the corpus (stands in for an external
    benchmark table).

    Scale: grams are md5-digested in the mapper, so the shuffle carries
    fixed 32-byte keys. The benchmark gram set is eval-benchmark-sized
    (thousands of docs), orders of magnitude below the corpus — AQE
    broadcasts it, making the whole check one corpus scan with zero
    fact-fact shuffle. Contrast q99 (self-join on shared grams): here
    the join side is *fixed* as the corpus grows.
    """
    d = load_table(spark, sf_dir, "documents")
    ex = d.select(
        "doc_id", F.explode(F.transform(shingles("text", 8), F.md5)).alias("digest")
    )
    bench = ex.filter(F.col("doc_id") % 97 == 0).select("digest").distinct()
    train = ex.filter(F.col("doc_id") % 97 != 0)
    return (
        train.join(bench.withColumn("hit", F.lit(1)), "digest", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.count("hit").alias("n_hits"),
        )
        .withColumn("contaminated", (F.col("n_hits") > 0).cast("int"))
    )


@query(
    "q137_zorder_layout",
    oracle="""
    WITH b AS (
      SELECT o_orderkey,
             o_custkey % 16 AS cb,
             (CAST(strftime(o_orderdate, '%Y') AS INTEGER) * 12
              + CAST(strftime(o_orderdate, '%m') AS INTEGER) - 1) % 16 AS db
      FROM orders),
    z AS (
      SELECT o_orderkey, cb, db,
             ((cb      & 1) << 1) | ((db      & 1)     ) |
             (((cb >> 1) & 1) << 3) | (((db >> 1) & 1) << 2) |
             (((cb >> 2) & 1) << 5) | (((db >> 2) & 1) << 4) |
             (((cb >> 3) & 1) << 7) | (((db >> 3) & 1) << 6) AS zval
      FROM b)
    SELECT zval // 16 AS zfile,
           COUNT(*) AS n_orders,
           MIN(cb) AS min_cb, MAX(cb) AS max_cb,
           MIN(db) AS min_db, MAX(db) AS max_db
    FROM z GROUP BY zval // 16
    """,
)
def q137_zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton) clustering key over two dimensions — the
    Delta/Iceberg OPTIMIZE ZORDER primitive. Interleaving the bits of
    the customer bucket and the month bucket yields a 1-D sort key
    under which consecutive "files" (zval//16 groups) are tight ranges
    in BOTH dimensions — per-file min/max spans stay narrow for cb and
    db simultaneously, which is what lets a zone map (q138) skip files
    for predicates on either column. A plain sort by one dim gives
    min=0/max=15 spans on the other; the output shows Z-order keeps
    both spans <= 3.

    Scale: the z-value is a pure codegen integer expression (shifts and
    masks, no UDF, no shuffle); in a real table rewrite it feeds
    ``repartitionByRange(zval)`` so each output file covers one z-range.
    The group-by here audits the layout: one map-side-combined
    aggregate, 16 output rows.
    """
    o = load_table(spark, sf_dir, "orders")
    cb = (F.col("o_custkey") % 16).cast("int")
    db = ((F.year("o_orderdate") * 12 + F.month("o_orderdate") - 1) % 16).cast("int")
    b = o.select(cb.alias("cb"), db.alias("db"))
    zval = F.lit(0)
    for i in range(4):
        zval = zval.bitwiseOR(
            F.shiftleft(F.shiftright(F.col("cb"), i).bitwiseAND(F.lit(1)), 2 * i + 1)
        ).bitwiseOR(
            F.shiftleft(F.shiftright(F.col("db"), i).bitwiseAND(F.lit(1)), 2 * i)
        )
    return (
        b.withColumn("zval", zval)
        .groupBy((F.col("zval") / 16).cast("bigint").alias("zfile"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.min("cb").alias("min_cb"),
            F.max("cb").alias("max_cb"),
            F.min("db").alias("min_db"),
            F.max("db").alias("max_db"),
        )
    )


@query(
    "q138_zonemap_pruning",
    oracle="""
    WITH z AS (
      SELECT o_orderkey // 512 AS zone,
             COUNT(*) AS n_rows,
             MIN(o_orderdate) AS min_date, MAX(o_orderdate) AS max_date,
             MIN(o_totalprice) AS min_price, MAX(o_totalprice) AS max_price
      FROM orders GROUP BY o_orderkey // 512)
    SELECT zone, n_rows, min_date, max_date,
           CAST(max_date < DATE '1997-01-01'
                OR min_date >= DATE '1998-01-01' AS INTEGER) AS skip_1997
    FROM z
    """,
)
def q138_zonemap_pruning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zone-map (data-skipping index) construction + pruning audit:
    per-zone min/max statistics — what parquet stores per row group and
    Delta per file — and, for the predicate ``o_orderdate IN 1997``, a
    flag for every zone the scanner can skip without reading data.
    Orders arrive roughly date-ordered by key, so key-contiguous zones
    have narrow date spans and most zones outside 1997 are skippable;
    this is the audit query a table-maintenance job runs to decide
    whether a re-cluster (q137) is worth it.

    Scale: building the map is one map-side-combined aggregate whose
    output is |zones| rows (~file count, millions at 100 TB — trivially
    distributed, never collected). The skip decision is a scalar
    expression on the stats row, exactly how Spark's own
    ParquetFilters/DataSkippingReader evaluate footer min/max.
    """
    o = load_table(spark, sf_dir, "orders")
    z = o.groupBy((F.col("o_orderkey") / 512).cast("bigint").alias("zone")).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.min("o_orderdate").alias("min_date"),
        F.max("o_orderdate").alias("max_date"),
        F.min("o_totalprice").alias("min_price"),
        F.max("o_totalprice").alias("max_price"),
    )
    skip = (F.col("max_date") < F.lit("1997-01-01").cast("date")) | (
        F.col("min_date") >= F.lit("1998-01-01").cast("date")
    )
    return z.select(
        "zone", "n_rows", "min_date", "max_date", skip.cast("int").alias("skip_1997")
    )


@query(
    "q139_weighted_sample",
    oracle="""
    WITH w AS (
      SELECT doc_id, LEAST(4, 1 + n_chars // 300) AS wt FROM documents),
    r AS (
      SELECT doc_id, wt, unnest(range(wt)) AS j FROM w),
    p AS (
      SELECT doc_id, wt,
             MIN(MD5('wsample:' || CAST(doc_id AS VARCHAR) || ':'
                     || CAST(j AS VARCHAR))) AS priority
      FROM r GROUP BY doc_id, wt)
    SELECT doc_id, wt, priority FROM p ORDER BY priority, doc_id LIMIT 100
    """,
)
def q139_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic weighted sample without replacement, integer-exact:
    each doc gets ``wt`` independent hash draws (replica index salted
    into the md5) and competes with its *minimum* draw; the global
    top-N by that priority selects docs with pairwise odds wt_a/(wt_a +
    wt_b) — the Efraimidis-Spirakis u^(1/w) scheme realized by hash
    replication instead of float pow(), so membership is bit-identical
    across engines, retries, and cluster sizes (q103's docstring
    explains why float ES keys are not portable). Weight here = doc
    length bucket, the "sample long documents more" curation knob.

    Scale: replication factor is <= 4, a bounded row multiply in the
    mapper; the per-doc min combines map-side, and orderBy+limit
    compiles to TakeOrderedAndProject (per-task top-N heaps, k-row
    driver merge, no global sort).
    """
    d = load_table(spark, sf_dir, "documents")
    w = d.select(
        "doc_id",
        F.least(F.lit(4), 1 + (F.col("n_chars") / 300).cast("bigint")).alias("wt"),
    )
    r = w.select(
        "doc_id", "wt", F.explode(F.sequence(F.lit(0), F.col("wt") - 1)).alias("j")
    )
    p = r.groupBy("doc_id", "wt").agg(
        F.min(
            F.md5(
                F.concat(
                    F.lit("wsample:"),
                    F.col("doc_id").cast("string"),
                    F.lit(":"),
                    F.col("j").cast("string"),
                )
            )
        ).alias("priority")
    )
    return p.orderBy("priority", "doc_id").limit(100)


# ---------------------------------------------------------------------------
# q149 — end-to-end curation pipeline (gate → dedup → budget → shard)
# ---------------------------------------------------------------------------

_SHARD_TOKENS = 20_000

_CURATE_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, text, lang, len(regexp_split_to_array(text, '\\s+')) AS tokens
  FROM documents),
gated AS (SELECT * FROM toks WHERE lang = 'en' AND tokens >= 30),
kept AS (
  SELECT doc_id, tokens FROM (
    SELECT doc_id, tokens,
           ROW_NUMBER() OVER (PARTITION BY MD5(text) ORDER BY doc_id) AS rn
    FROM gated) WHERE rn = 1),
sharded AS (
  SELECT doc_id, tokens,
         CAST(COALESCE(SUM(tokens) OVER (ORDER BY doc_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              // {_SHARD_TOKENS} AS BIGINT) AS shard
  FROM kept)
SELECT shard, COUNT(*) AS n_docs, CAST(SUM(tokens) AS BIGINT) AS sum_tokens,
       MIN(doc_id) AS min_doc, MAX(doc_id) AS max_doc
FROM sharded GROUP BY shard
"""


@query("q149_curation_pipeline", oracle=_CURATE_ORACLE)
def q149_curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The whole curation flow a training run needs, as ONE declarative
    plan: quality gate (language + minimum length) → exact dedup
    keeping the lowest doc_id per content digest → token-budgeted
    shard assignment (docs stream into ~20k-token shards in doc_id
    order) → per-shard manifest. A user of the individual operators
    (q50, q57/q58, q75, q104) runs this shape daily; the query proves
    the pieces compose without leaving the DataFrame algebra.

    The shard boundary needs a *global* exclusive running sum of
    tokens in doc_id order — the one step that naively becomes a
    single-partition window. Same discipline as q107: range-bucket on
    doc_id, per-bucket local running sums, broadcast prefix offsets of
    per-bucket totals; no global sort, no single-partition funnel, and
    the result equals the oracle's SUM() OVER (ORDER BY doc_id ROWS
    ... 1 PRECEDING) exactly (integer token counts — order-stable).

    Scale: gate and digest are map-side; dedup is one shuffle on the
    digest; sharding exchanges only bucket totals (|buckets| rows) and
    one local window per bucket. Bucket width: doc_id div 500 here —
    at 100 TB derive ~4096 buckets from the id range the same way.
    """
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        "text",
        "lang",
        F.size(F.split("text", r"\s+")).alias("tokens"),
    )
    gated = toks.filter((F.col("lang") == "en") & (F.col("tokens") >= 30))
    dedup_w = W.partitionBy(F.md5(F.col("text").cast("binary"))).orderBy("doc_id")
    kept = (
        gated.withColumn("rn", F.row_number().over(dedup_w))
        .filter(F.col("rn") == 1)
        .select("doc_id", "tokens")
    )
    bucketed = kept.withColumn("bucket", F.expr("doc_id div 500"))
    totals = bucketed.groupBy("bucket").agg(F.sum("tokens").alias("btotal"))
    prefix_w = W.orderBy("bucket").rowsBetween(W.unboundedPreceding, -1)
    offsets = totals.withColumn(
        "offset", F.coalesce(F.sum("btotal").over(prefix_w), F.lit(0))
    ).select("bucket", "offset")
    local_w = (
        W.partitionBy("bucket").orderBy("doc_id").rowsBetween(W.unboundedPreceding, -1)
    )
    sharded = (
        bucketed.withColumn(
            "local_before", F.coalesce(F.sum("tokens").over(local_w), F.lit(0))
        )
        .join(F.broadcast(offsets), "bucket")
        .select(
            "doc_id",
            "tokens",
            F.expr(f"(offset + local_before) div {_SHARD_TOKENS}").alias("shard"),
        )
    )
    return sharded.groupBy("shard").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("tokens").cast("bigint").alias("sum_tokens"),
        F.min("doc_id").alias("min_doc"),
        F.max("doc_id").alias("max_doc"),
    )
