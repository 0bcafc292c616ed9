"""Scale-infrastructure operators: integrity sweeps, hierarchy closure,
iterative graph algorithms, and vector compression.

These are the maintenance/structure operators a 100 TB lakehouse needs
around the query surface: anti-entropy table fingerprints (validate a
replicated/migrated table without moving it), transitive-closure
hierarchy expansion, bounded label-propagation connected components
(dedup-cluster style grouping at corpus scale), int8 scalar
quantization of embedding columns (the standard 4x shrink before ANN
serving), and a corpus character-profile quality gate.

The reference has no analogue (it is an ETL pipeline, SURVEY.md §0);
these extend the engine along the driver's training-data-pipeline
mandate. Every float expression is either exact-integer or a mirrored
single sequence of IEEE double ops, so the DuckDB oracle hash-matches
bit-for-bit (see functions.dsum docstring for the technique).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from kinesis_producer_spark.registry import query
from kinesis_producer_spark.tables import load_table

# ---------------------------------------------------------------------------
# q140 — per-bucket table fingerprint (anti-entropy checksum)
# ---------------------------------------------------------------------------

# 40-bit row hash from the md5 hex prefix, built from primitives both
# engines share (INSTR/SUBSTR); identical expression text runs on each.
_NIBBLES = " + ".join(
    f"CAST(INSTR('0123456789abcdef', SUBSTR(h, {k}, 1)) - 1 AS BIGINT)"
    f" * {16 ** (10 - k)}"
    for k in range(1, 11)
)

_FPR_ORACLE = f"""
WITH rows_h AS (
  SELECT l_orderkey % 16 AS bucket,
         MD5(CONCAT_WS('|', l_orderkey, l_partkey, l_suppkey, l_linenumber,
                       l_returnflag, l_linestatus)) AS h
  FROM lineitem)
SELECT bucket, COUNT(*) AS n_rows,
       CAST(SUM({_NIBBLES}) AS BIGINT) AS checksum
FROM rows_h GROUP BY bucket
"""


@query("q140_partition_fingerprint", oracle=_FPR_ORACLE)
def q140_partition_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-independent content checksum per hash bucket.

    The anti-entropy primitive: two copies of a table (pre/post
    migration, two regions) compare 16 (bucket, n_rows, checksum)
    triples instead of 100 TB of rows, and a mismatched bucket narrows
    the rescan 16x (recurse with a finer modulus for binary search).

    Scale: embarrassingly parallel — the row hash is map-side, the
    aggregate is a 16-key hash agg with map-side partials, so the
    exchange carries 16 rows per task regardless of table size. The
    40-bit-per-row sum stays far from bigint overflow (2^40 x 6e9 rows
    < 2^73 would overflow — at >1e6 rows per bucket move the sum into
    decimal(38,0); at fixture scales bigint is exact).
    """
    li = load_table(spark, sf_dir, "lineitem")
    rows_h = li.select(
        (F.col("l_orderkey") % 16).alias("bucket"),
        F.md5(
            F.concat_ws(
                "|",
                "l_orderkey",
                "l_partkey",
                "l_suppkey",
                "l_linenumber",
                "l_returnflag",
                "l_linestatus",
            ).cast("binary")
        ).alias("h"),
    )
    return rows_h.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.expr(_NIBBLES)).cast("bigint").alias("checksum"),
    )


# ---------------------------------------------------------------------------
# q141 — corpus character profile (log-free entropy proxy quality gate)
# ---------------------------------------------------------------------------

_ALPHABET = "abcdefghijklmnopqrstuvwxyz "

_CHR_ORACLE = f"""
WITH counts AS (
  SELECT source, ch,
         SUM(LENGTH(t) - LENGTH(REPLACE(t, ch, ''))) AS c,
         SUM(LENGTH(t)) AS chars_total
  FROM (SELECT source, LOWER(text) AS t FROM documents)
  CROSS JOIN (SELECT UNNEST({[c for c in _ALPHABET]!r}) AS ch)
  GROUP BY source, ch)
SELECT source,
       CAST(MAX(chars_total) AS BIGINT) AS total_chars,
       CAST(SUM(c) AS BIGINT) AS alpha_chars,
       CAST(FLOOR(1e6 * (CAST(SUM(c * c) AS DOUBLE)
              / (CAST(SUM(c) AS DOUBLE) * CAST(SUM(c) AS DOUBLE))) + 0.5) AS BIGINT)
         AS collision_micro,
       CAST(FLOOR(1e6 * (CAST(SUM(c) AS DOUBLE) / CAST(MAX(chars_total) AS DOUBLE)) + 0.5)
         AS BIGINT) AS alpha_ratio_micro
FROM counts GROUP BY source
"""


@query("q141_char_profile", oracle=_CHR_ORACLE)
def q141_char_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source character-distribution profile: collision probability
    (sum p^2 — a Renyi-2 entropy proxy, deliberately log-free so both
    engines agree bit-for-bit; see q130's idf note) and alphabetic
    ratio. Low alpha_ratio or high collision flags boilerplate/binary
    junk sources — the cheapest corpus-quality gate, run before any
    tokenization.

    Scale: per-character counts use LENGTH(REPLACE(...)) over a
    27-row cross join instead of exploding the text to one row per
    character — the scan stays O(docs x alphabet) rows with all the
    string work inside whole-stage codegen, and the aggregate keys on
    (source, ch): a few hundred groups whatever the corpus size.
    SUM(c*c) at 100 TB: c ~ 1e12 per (source, ch) would overflow
    bigint squared — the decimal(38,0) accumulator below is exact to
    1e19 per char; beyond that, profile per (source, shard) first.
    """
    d = load_table(spark, sf_dir, "documents")
    chars = F.explode(F.array(*[F.lit(c) for c in _ALPHABET])).alias("ch")
    counts = (
        d.select("source", F.lower("text").alias("t"))
        .select("source", "t", chars)
        .groupBy("source", "ch")
        .agg(
            F.sum(F.length("t") - F.length(F.replace("t", "ch"))).alias("c"),
            F.sum(F.length("t")).alias("chars_total"),
        )
    )
    sc = F.sum("c").cast("decimal(38,0)")
    # cast each factor BEFORE the multiply: per-row c*c in bigint would
    # silently overflow at c > ~3e9 long before the post-sum cast ran
    sc2 = F.sum(F.col("c").cast("decimal(38,0)") * F.col("c").cast("decimal(38,0)"))
    return counts.groupBy("source").agg(
        F.max("chars_total").alias("total_chars"),
        sc.cast("bigint").alias("alpha_chars"),
        F.floor(
            F.lit(1e6) * (sc2.cast("double") / (sc.cast("double") * sc.cast("double")))
            + F.lit(0.5)
        )
        .cast("bigint")
        .alias("collision_micro"),
        F.floor(
            F.lit(1e6) * (sc.cast("double") / F.max("chars_total").cast("double"))
            + F.lit(0.5)
        )
        .cast("bigint")
        .alias("alpha_ratio_micro"),
    )


# ---------------------------------------------------------------------------
# q142 — hierarchy transitive closure, recursion vectorized closed-form
# ---------------------------------------------------------------------------

_MAX_DEPTH = 8  # covers custkey < 10^8 — every fixture scale and then some

_CLOSURE_ORACLE = """
WITH RECURSIVE r AS (
  SELECT c_custkey AS custkey, c_custkey // 10 AS ancestor, 1 AS depth
  FROM customer WHERE c_custkey >= 1
  UNION ALL
  SELECT custkey, ancestor // 10, depth + 1 FROM r WHERE ancestor >= 1)
SELECT custkey, ancestor, depth FROM r
"""


@query("q142_ancestor_closure", oracle=_CLOSURE_ORACLE)
def q142_ancestor_closure(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transitive closure of the decimal-digit hierarchy custkey ->
    custkey/10 -> ... -> 0 (an org-chart / BOM ancestor expansion).

    The oracle recurses; Spark has no WITH RECURSIVE, and the idiomatic
    answer is NOT a driver-side loop of self-joins: because each node's
    parent is a pure function of its key, ancestor at depth i is the
    closed form custkey div 10^i — the whole closure is one explode
    over depths with an arithmetic validity filter (depth i exists iff
    custkey >= 10^(i-1)). Zero joins, zero shuffles, zero iterations.

    Scale: rows-out = sum of chain lengths (~log10(key) per row), all
    map-side. For hierarchies that ARE table-driven (no closed form),
    the engine's pattern is path-doubling: log2(depth) self-joins on a
    bucketed key — see q144 for the iterative-join variant.
    """
    c = load_table(spark, sf_dir, "customer")
    depths = F.explode(F.sequence(F.lit(1), F.lit(_MAX_DEPTH))).alias("depth")
    return (
        c.filter(F.col("c_custkey") >= 1)
        .select(F.col("c_custkey").alias("custkey"), depths)
        .filter(F.col("custkey") >= F.pow(F.lit(10.0), F.col("depth") - 1).cast("bigint"))
        .select(
            "custkey",
            F.expr(f"custkey div cast(pow(10.0, depth) as bigint)").alias("ancestor"),
            "depth",
        )
    )


# ---------------------------------------------------------------------------
# q143 — int8 scalar quantization of the embedding column
# ---------------------------------------------------------------------------

_QUANT_ORACLE = """
WITH dims AS (
  SELECT d, CAST(FLOOR(CAST(embedding[d] AS DOUBLE) * 1e6 + 0.5) AS BIGINT) AS qx
  FROM embeddings CROSS JOIN (SELECT UNNEST(RANGE(1, 65)) AS d)),
stats AS (SELECT d, MIN(qx) AS qmin, MAX(qx) AS qmax FROM dims GROUP BY d),
coded AS (
  SELECT dims.d, qx, qmin, qmax,
         CASE WHEN qmax = qmin THEN 0
              ELSE CAST(FLOOR(CAST(qx - qmin AS DOUBLE) * 255.0
                         / CAST(qmax - qmin AS DOUBLE) + 0.5) AS BIGINT) END AS code
  FROM dims JOIN stats ON dims.d = stats.d)
SELECT d, COUNT(*) AS n_vecs, MIN(code) AS code_min, MAX(code) AS code_max,
       CAST(SUM(ABS(qx - (qmin + CAST(FLOOR(CAST(code AS DOUBLE)
              * CAST(qmax - qmin AS DOUBLE) / 255.0 + 0.5) AS BIGINT)))) AS BIGINT)
         AS sum_abs_err_micro
FROM coded GROUP BY d
"""


@query("q143_int8_quantization", oracle=_QUANT_ORACLE)
def q143_int8_quantization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension int8 scalar quantization with reconstruction-error
    audit — the standard 4x compression applied to an embedding column
    before building a serving ANN index (q55/q56): code = round(255 *
    (x-min)/(max-min)), plus the L1 reconstruction error that decides
    whether int8 is acceptable or a dim needs float16.

    Exactness: elements quantize to integer micro-units first, so
    min/max are exact ints and encode/decode is one mirrored sequence
    of double ops on exact operands (see functions module docstring).

    Scale: pass 1 computes 64 (min,max) rows via a map-side-partial
    agg; pass 2 re-scans and encodes with those stats broadcast —
    never shuffling the vectors themselves. That two-scan shape (tiny
    stats exchange, data stays put) is the only layout that survives a
    billion-vector corpus; a sort- or window-based min/max would
    shuffle every element.
    """
    e = load_table(spark, sf_dir, "embeddings")
    dims = e.select(F.posexplode("embedding").alias("pos", "x")).select(
        (F.col("pos") + 1).alias("d"),
        F.floor(F.col("x").cast("double") * 1e6 + F.lit(0.5)).cast("bigint").alias("qx"),
    )
    stats = dims.groupBy("d").agg(F.min("qx").alias("qmin"), F.max("qx").alias("qmax"))
    spread = F.col("qmax") - F.col("qmin")
    # constant dimension (qmax == qmin) would otherwise compute 0·255/0
    # = NaN, and NaN→bigint casts diverge across engines; both sides
    # take the explicit zero branch instead
    code = F.when(spread == 0, F.lit(0).cast("bigint")).otherwise(
        F.floor(
            (F.col("qx") - F.col("qmin")).cast("double") * 255.0 / spread.cast("double")
            + F.lit(0.5)
        ).cast("bigint")
    )
    coded = dims.join(F.broadcast(stats), "d").withColumn("code", code)
    recon = F.col("qmin") + F.floor(
        F.col("code").cast("double") * spread.cast("double") / 255.0 + F.lit(0.5)
    ).cast("bigint")
    return coded.groupBy("d").agg(
        F.count(F.lit(1)).alias("n_vecs"),
        F.min("code").alias("code_min"),
        F.max("code").alias("code_max"),
        F.sum(F.abs(F.col("qx") - recon)).cast("bigint").alias("sum_abs_err_micro"),
    )


# ---------------------------------------------------------------------------
# q144 — fixpoint label-propagation connected components
# ---------------------------------------------------------------------------

# Safety cap on propagation rounds: fixpoint arrives in O(component
# diameter) rounds, so the cap only exists to bound a pathological
# input (a 64-hop chain of co-purchased parts is not a real basket
# graph shape); hitting it raises rather than silently under-labeling.
_LP_MAX_ROUNDS = 64


class _scoped_shuffle:
    """Scope ``spark.sql.shuffle.partitions`` to an eager computation
    and restore it on exit. The fixpoint queries materialize every
    shuffle INSIDE the scope (persist + per-round localCheckpoint), so
    a size-derived partition count applies to the whole loop without
    leaking into the session — the weak-scaling knob the sf10 soak
    needed as an env override (SPARK_GRAFT_SHUFFLE=640), made
    plan-derived. AQE's coalescing still shrinks small stages back
    down, so a generous count costs nothing at small SFs."""

    def __init__(
        self, spark: SparkSession, n: int, disable_coalesce: bool = False
    ):
        # disable_coalesce: AQE sizes post-shuffle partitions on the
        # exchange's COMPRESSED INPUT bytes, so a stage whose work
        # explodes in-stage (per-group combination expansion, per-row
        # fan-out) gets coalesced back to a handful of fat tasks that
        # sort-spill — measured on q144 at sf10: 1000 derived
        # partitions coalesced to ~50, ~470 MB sorts, 28 GB spill.
        # Scoping coalescing OFF lets the row-derived count stand;
        # callers pass it only when the derived count exceeds the
        # default (small inputs keep AQE's packing).
        self.spark, self.n = spark, n
        self.disable_coalesce = disable_coalesce

    def __enter__(self):
        conf = self.spark.conf
        self.old = conf.get("spark.sql.shuffle.partitions")
        self.old_coal = conf.get(
            "spark.sql.adaptive.coalescePartitions.enabled"
        )
        self.old_split = conf.get("spark.sql.files.maxPartitionBytes")
        conf.set("spark.sql.shuffle.partitions", str(self.n))
        if self.disable_coalesce:
            conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
            # The SCAN stage's map-side partial aggregation sizes with
            # the file split, not shuffle partitions — at 128 MB splits
            # a fat per-split hash state (collect_list of a wide group)
            # still spills; a big-input scope narrows the splits too.
            conf.set("spark.sql.files.maxPartitionBytes", str(32 * 1024 * 1024))
            # ObjectHashAggregate (collect_list/collect_set partials)
            # falls back to SORT-BASED aggregation after 128 distinct
            # keys by default — on a million-key scan split that is an
            # unconditional sort-spill. The split cap above bounds the
            # per-task state, so the hash path is safe to keep.
            self.old_obj = conf.get(
                "spark.sql.objectHashAggregate.sortBased.fallbackThreshold"
            )
            conf.set(
                "spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
                str(1 << 22),
            )
        return self

    def __exit__(self, *exc):
        conf = self.spark.conf
        conf.set("spark.sql.shuffle.partitions", self.old)
        conf.set(
            "spark.sql.adaptive.coalescePartitions.enabled", self.old_coal
        )
        conf.set("spark.sql.files.maxPartitionBytes", self.old_split)
        if self.disable_coalesce:
            conf.set(
                "spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
                self.old_obj,
            )
        return False


def _scaled_shuffle_partitions(
    spark: SparkSession, n_rows: int, rows_per_partition: int = 60_000,
    cap: int = 4096,
) -> int:
    """Shuffle-partition count derived from the driving table's row
    count (parquet metadata — a cheap count job): enough partitions
    that a sort/hash aggregate over ~rows_per_partition-row partitions
    stays in executor memory at ANY scale factor, floored at the
    session default (never fewer than configured), capped to keep task
    scheduling overhead bounded. At 100 TB the same rule holds —
    partition count tracks input size, not a fixed conf."""
    default = int(spark.conf.get("spark.sql.shuffle.partitions"))
    return max(default, min(cap, n_rows // rows_per_partition))

_CC_ORACLE = """
WITH RECURSIVE base AS (
  WITH items AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
  pairs AS (SELECT a.l_partkey AS a, b.l_partkey AS b
            FROM items a JOIN items b
              ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey)
  SELECT a, b FROM pairs GROUP BY a, b HAVING COUNT(*) >= 2),
und AS (SELECT a AS u, b AS v FROM base UNION ALL SELECT b, a FROM base),
verts AS (SELECT DISTINCT u AS v FROM und),
reach AS (
  SELECT v, v AS u FROM verts
  UNION
  SELECT r.v, e.v AS u FROM reach r JOIN und e ON e.u = r.u)
SELECT v AS part, MIN(u) AS label FROM reach GROUP BY v
"""


def min_label_components(
    und: DataFrame,
    verts: DataFrame,
    max_rounds: int = _LP_MAX_ROUNDS,
    check_every: int = 2,
) -> DataFrame:
    """Connected-component labels by synchronous min-label propagation,
    looped to FIXPOINT (not a fixed round count, which under-labels any
    component whose diameter exceeds the count).

    ``und`` must be the symmetrized edge list (columns u, v) WITH a
    self-loop per vertex, persisted and pre-partitioned on ``u``;
    ``verts`` the distinct vertex frame (column u). Convergence check:
    labels only ever decrease, so ``sum(label)`` is strictly monotone
    until the fixpoint — one 1-row aggregate (no old-vs-new join), and
    the eager localCheckpoint each round means the check costs no
    recomputation. This is the Pregel halting rule (no messages change
    state) expressed as a scalar invariant.

    ``check_every`` sets the cadence of that 1-row action: every round
    is correct but serializes a driver round-trip into each iteration;
    checking every k-th round amortizes the latency at high diameters.
    The halting rule is cadence-safe BECAUSE the sum is monotone: if
    any of the k rounds between two checks changed a label, the sum
    strictly decreased — so equal consecutive CHECK values prove the
    fixpoint was reached at or before the earlier check. Cost of k>1:
    up to k−1 no-op rounds after convergence; with k=2 that is one
    cheap extra join against ~log-diameter rounds saved in driver
    latency.

    Scale: per round one co-partitioned join (labels to edges on u)
    + one min-agg shuffle on v; the checkpoint truncates lineage so
    round N's plan stays two leaf relations regardless of N.
    """
    if check_every < 1:
        raise ValueError("check_every must be >= 1")
    labels = verts.select(F.col("u").alias("part"), F.col("u").alias("label"))
    prev_sum = None
    for i in range(max_rounds):
        labels = (
            und.join(labels, und["u"] == labels["part"])
            .groupBy(F.col("v").alias("part"))
            .agg(F.min("label").alias("label"))
            .localCheckpoint(eager=True)
        )
        if (i + 1) % check_every == 0 or i == max_rounds - 1:
            # decimal(38,0) sum: the invariant is Σ label over ALL
            # vertices — at wide-key corpora (the sf10 soak: ids near
            # 2^46 over millions of vertices) an int64 sum overflows
            # long before any single label does. Monotonicity is
            # unaffected; 38 digits cover 2^63 ids × 10^18 vertices.
            s = labels.agg(
                F.sum(F.col("label").cast("decimal(38,0)"))
            ).collect()[0][0]
            if s == prev_sum:
                return labels
            prev_sum = s
    raise RuntimeError(
        f"min_label_components did not converge within {max_rounds} rounds"
    )


@query("q144_connected_components", oracle=_CC_ORACLE)
def q144_connected_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected components of the co-purchase part graph (parts linked
    when bought together in >= 2 orders) via min-label propagation
    looped to FIXPOINT — the same iterated-join shape that groups
    near-duplicate documents once LSH has produced candidate edges
    (q101 picks representatives; this labels whole clusters).

    Fixpoint, not a fixed round count: a bounded loop assigns each
    vertex the min id of its k-hop neighborhood, which under-labels
    any component of diameter > k — a silent correctness hazard if
    the graph shape shifts. The oracle is the matching closed form:
    full recursive reachability (UNION-deduplicated, so it terminates
    at the transitive closure) with MIN over each reach set.

    Scale: each round is one shuffle — join labels to edges on the
    source endpoint, then min-agg on the destination. Two disciplines
    make the iteration viable beyond toy graphs: (a) the edge list is
    persisted once (it is re-read every round; recomputing it would
    redo the pair self-join each round), and (b) each round's labels
    are localCheckpoint-ed, truncating lineage so round N's plan is
    one join over two leaf relations instead of an N-deep tree
    (without this the plan grows ~250 exchanges by round 5 — measured
    with tools/plan_audit.py). Same pattern as GraphX/GraphFrames
    Pregel; see min_label_components for the halting rule.
    """
    from kinesis_producer_spark.operators.baskets import ordered_item_pairs

    li = load_table(spark, sf_dir, "lineitem")
    # Size the WHOLE fixpoint's shuffles from the input (parquet
    # metadata count — cheap): at a fixed 64 partitions the sf10 soak
    # spilled ~28 GB in the pair-gen and per-round aggregates; derived
    # counts keep every partition's aggregate state in memory at any
    # decade while AQE coalesces them back down at small SFs
    # (round-11 verdict #3 — the env knob made plan-derived).
    default = int(spark.conf.get("spark.sql.shuffle.partitions"))
    n_parts = _scaled_shuffle_partitions(spark, li.count())
    with _scoped_shuffle(spark, n_parts, disable_coalesce=n_parts > default):
        # Pair generation without a self-join (ordered_item_pairs): one
        # groupBy(orderkey) exchange + in-row combination expansion,
        # then one groupBy counts support — two exchanges where the
        # alias self-join shape needed four.
        base = (
            ordered_item_pairs(
                li, "l_orderkey", "l_partkey", out=("ok", "s", "t")
            )
            .groupBy("s", "t")
            .agg(F.count(F.lit(1)).alias("w"))
            .filter(F.col("w") >= 2)
            .select("s", "t")
        )
        from pyspark import StorageLevel

        verts = (
            base.select(F.col("s").alias("u")).union(base.select("t")).distinct()
        )
        # Symmetrized edges + a self-loop per vertex: min over
        # in-neighbors of (edges + self-loops) IS min(own label,
        # neighbor labels), so each round is join + min-agg — two
        # exchanges, no per-round left join to merge the previous
        # label back in.
        # Persist the edges ALREADY partitioned on the join key: every
        # one of the 5 rounds joins on u, and a pre-shuffled persisted
        # frame lets each round reuse the exchange instead of
        # re-shuffling the edge list (measured 2.5× on the whole loop
        # at sf0.1).
        und = (
            base.union(base.select(F.col("t"), F.col("s")))
            .toDF("u", "v")
            .union(verts.select(F.col("u"), F.col("u").alias("v")))
            .repartition("u")
            .persist(StorageLevel.MEMORY_AND_DISK)
        )
        return min_label_components(und, verts)


# ---------------------------------------------------------------------------
# q145 — KMV (k-minimum-values) distinct-count sketch, exact cross-engine
# ---------------------------------------------------------------------------

_KMV_K = 64

# 48-bit integer from the first 12 hex chars of a column named kh —
# double-exact (< 2^53), shared expression text with the oracle.
_H48 = " + ".join(
    f"CAST(INSTR('0123456789abcdef', SUBSTR(kh, {k}, 1)) - 1 AS BIGINT)"
    f" * {16 ** (12 - k)}"
    for k in range(1, 13)
)


def kmv_partial_sketch(d: DataFrame, *key_cols: str, hash_col: str = "h") -> DataFrame:
    """Per-key KMV sketch (the k lexicographically smallest DISTINCT
    hashes) via the two-level mergeable build: bottom-k per partition
    (k rows per partition per key cross the exchange, never raw
    values), then a per-key merge of partials. Shared by q145, q224,
    and the streaming form (streaming/sketches.py) — the map-side
    bottom-K pattern lives in exactly one place.

    Distinctness is enforced INSIDE the sketch (collect_set per
    partition, array_distinct at the merge): a duplicated hash must
    never occupy two of the k slots and evict the true kth value, even
    when the caller passes raw multiset input."""
    partials = (
        d.withColumn("pid", F.spark_partition_id())
        .groupBy(*key_cols, "pid")
        .agg(F.slice(F.array_sort(F.collect_set(hash_col)), 1, _KMV_K).alias("ks"))
    )
    return partials.groupBy(*key_cols).agg(
        F.slice(
            F.array_distinct(F.array_sort(F.flatten(F.collect_list("ks")))),
            1,
            _KMV_K,
        ).alias("ks")
    )

_KMV_ORACLE = f"""
WITH d AS (SELECT DISTINCT o_orderpriority AS key,
                  MD5('c:' || CAST(o_custkey AS VARCHAR)) AS h
           FROM orders),
r AS (SELECT key, h, ROW_NUMBER() OVER (PARTITION BY key ORDER BY h) AS rn FROM d),
kth AS (SELECT key, {_H48.replace('kh', 'h')} AS v48 FROM r WHERE rn = {_KMV_K}),
ex AS (SELECT o_orderpriority AS key, COUNT(DISTINCT o_custkey) AS exact_distinct
       FROM orders GROUP BY 1)
SELECT ex.key, exact_distinct,
       CAST(FLOOR(CAST({(_KMV_K - 1) * 281474976710656} AS DOUBLE)
                  / CAST(v48 AS DOUBLE) + 0.5)
         AS BIGINT) AS kmv_estimate
FROM ex JOIN kth ON ex.key = kth.key
"""


@query("q145_kmv_distinct_sketch", oracle=_KMV_ORACLE)
def q145_kmv_distinct_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct customers per order priority via a KMV (k-minimum-
    values) sketch, reported next to the exact count so the estimate's
    error is visible in the result itself.

    Unlike HLL (engine-specific register layouts — exercised separately
    in tests via approx_count_distinct's error bound), KMV is exactly
    reproducible anywhere: the sketch is the k lexicographically
    smallest md5 hashes of the distinct values, and the estimator is
    (k-1)/frac(kth smallest) — pure order statistics, so Spark and
    DuckDB agree bit-for-bit.

    Scale: KMV is a *mergeable* sketch — the k smallest overall are
    the k smallest of the per-partition k smallest. The plan computes
    per-partition partial sketches (collect k per (key, partition)),
    then merges per key: the exchange carries k rows per partition per
    key instead of every distinct hash. 100 TB shape: same two-level
    agg, k·P rows shuffled, never the raw values.
    """
    o = load_table(spark, sf_dir, "orders")
    d = (
        o.select(
            F.col("o_orderpriority").alias("key"),
            F.md5(
                F.concat(F.lit("c:"), F.col("o_custkey").cast("string")).cast("binary")
            ).alias("h"),
        )
        .distinct()
    )
    merged = (
        kmv_partial_sketch(d, "key")
        .select("key", F.get("ks", _KMV_K - 1).alias("kh"))
        .filter(F.col("kh").isNotNull())
        .select("key", F.expr(_H48).alias("v48"))
    )
    exact = o.groupBy(F.col("o_orderpriority").alias("key")).agg(
        F.count_distinct("o_custkey").alias("exact_distinct")
    )
    est = F.floor(
        F.lit(float((_KMV_K - 1) * 281474976710656)) / F.col("v48").cast("double")
        + F.lit(0.5)
    ).cast("bigint")
    return exact.join(F.broadcast(merged), "key").select(
        "key", "exact_distinct", est.alias("kmv_estimate")
    )


# ---------------------------------------------------------------------------
# q148 — incremental view maintenance with retractions
# ---------------------------------------------------------------------------

_IVM_ORACLE = """
WITH base AS (
  SELECT user_id,
         CASE WHEN event_id % 50 = 0 THEN value + 10.0 ELSE value END AS value
  FROM events),
late AS (SELECT user_id, value * 0.5 AS value FROM events WHERE event_id % 97 = 0),
allr AS (SELECT * FROM base UNION ALL SELECT * FROM late)
SELECT user_id, COUNT(*) AS n_events,
       CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS HUGEINT)) AS BIGINT) AS sum_cents
FROM allr GROUP BY user_id
"""


@query("q148_incremental_view_maintenance", oracle=_IVM_ORACLE)
def q148_incremental_view_maintenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maintain a per-user materialized aggregate under a change batch
    — corrections (event_id%50: value revised +10) and late-arriving
    inserts (event_id%97: a 0.5-weighted replay) — WITHOUT rescanning
    history: the view is updated as

        view' = view  ⊎  (-1)·retract(old rows)  ⊎  (+1)·insert(new rows)

    i.e. signed delta aggregation merged into the old view by key.
    The oracle recomputes the final state from scratch; equality
    proves the retraction algebra is exact (counts via Σsign, sums in
    the quantized integer domain where subtraction is lossless —
    double sums would drift under retraction).

    Scale: the maintenance scan is O(|delta| + |view|), never
    O(|history|) — the whole point of a materialized view at 100 TB.
    This is the batch-expressible form of Structured Streaming's
    update-mode aggregation (the state store holds `view`, each
    micro-batch is `delta`); q133 exercises the streaming path.
    """
    e = load_table(spark, sf_dir, "events")
    cents = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint")
    old_view = e.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n"), F.sum(cents).alias("s")
    )
    corr = e.filter(F.col("event_id") % 50 == 0)
    retract = corr.select("user_id", F.lit(-1).alias("sign"), cents.alias("c"))
    insert = corr.select(
        "user_id",
        F.lit(1).alias("sign"),
        F.floor((F.col("value") + F.lit(10.0)) * 100 + F.lit(0.5))
        .cast("bigint")
        .alias("c"),
    )
    late = e.filter(F.col("event_id") % 97 == 0).select(
        "user_id",
        F.lit(1).alias("sign"),
        F.floor((F.col("value") * F.lit(0.5)) * 100 + F.lit(0.5))
        .cast("bigint")
        .alias("c"),
    )
    delta = (
        retract.union(insert)
        .union(late)
        .groupBy("user_id")
        .agg(F.sum("sign").alias("dn"), F.sum(F.col("sign") * F.col("c")).alias("ds"))
    )
    merged = old_view.join(delta, "user_id", "full_outer").select(
        "user_id",
        (F.coalesce(F.col("n"), F.lit(0)) + F.coalesce(F.col("dn"), F.lit(0))).alias(
            "n_events"
        ),
        (F.coalesce(F.col("s"), F.lit(0)) + F.coalesce(F.col("ds"), F.lit(0))).alias(
            "sum_cents"
        ),
    )
    return merged.filter(F.col("n_events") > 0)


# ---------------------------------------------------------------------------
# q150 — PageRank in the exact integer domain (3 unrolled rounds)
# ---------------------------------------------------------------------------

_PR_ROUNDS = 3

_PR_EDGES_SQL = """
base AS (
  WITH items AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
  pairs AS (SELECT a.l_partkey AS a, b.l_partkey AS b
            FROM items a JOIN items b
              ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey)
  SELECT a, b FROM pairs GROUP BY a, b HAVING COUNT(*) >= 2),
und AS (SELECT a AS u, b AS v FROM base UNION ALL SELECT b, a FROM base),
deg AS (SELECT u, COUNT(*) AS d FROM und GROUP BY u),
r0 AS (SELECT u AS v, CAST(1000000 AS BIGINT) AS r FROM deg)"""


def _pr_round_sql(i: int) -> str:
    return f"""
r{i + 1} AS (
  SELECT e.v,
         CAST(150000 + (SUM(r{i}.r // deg.d) * 85) // 100 AS BIGINT) AS r
  FROM und e JOIN r{i} ON e.u = r{i}.v JOIN deg ON deg.u = e.u
  GROUP BY e.v)"""


_PR_ORACLE = (
    "WITH RECURSIVE "
    + _PR_EDGES_SQL
    + ","
    + ",".join(_pr_round_sql(i) for i in range(_PR_ROUNDS))
    + f"""
SELECT v AS part, r AS pagerank_micro FROM r{_PR_ROUNDS}
"""
)


@query("q150_pagerank_integer", oracle=_PR_ORACLE)
def q150_pagerank_integer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank (damping 0.85, 3 synchronous rounds) over the
    co-purchase graph, computed ENTIRELY in integer micro-units:
    contributions are r//deg (integer division), the damped update is
    150000 + (Σcontrib·85)//100. No doubles exist anywhere in the
    recursion, so the distributed sum is order-independent and the
    oracle — the same three rounds unrolled — matches bit-for-bit.
    This is the general recipe for making iterative numeric algorithms
    reproducible on a cluster: put the accumulator in an exact domain,
    quantizing once per round (cf. functions.dsum for one-shot aggs).

    Scale: per round, one co-partitioned join (ranks to edges on the
    source) + one min-shuffle agg on the destination — identical
    shape and hygiene to q144 (edges persisted once, ranks
    localCheckpoint-ed per round so the plan stays constant-size).
    """
    from pyspark import StorageLevel

    from kinesis_producer_spark.operators.baskets import ordered_item_pairs

    li = load_table(spark, sf_dir, "lineitem")
    # Same in-row pair generation (ordered_item_pairs) and
    # key-partitioned edge persist as q144: two exchanges for the
    # build, and every rank round joins on u against an already-
    # u-partitioned persisted frame (exchange reuse).
    base = (
        ordered_item_pairs(li, "l_orderkey", "l_partkey", out=("ok", "s", "t"))
        .groupBy("s", "t")
        .agg(F.count(F.lit(1)).alias("w"))
        .filter(F.col("w") >= 2)
        .select("s", "t")
    )
    und = (
        base.union(base.select(F.col("t"), F.col("s")))
        .toDF("u", "v")
        .repartition("u")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    deg = und.groupBy("u").agg(F.count(F.lit(1)).alias("d"))
    edges = und.join(deg, "u").persist(StorageLevel.MEMORY_AND_DISK)
    ranks = deg.select(F.col("u").alias("rv"), F.lit(1_000_000).cast("bigint").alias("r"))
    for _ in range(_PR_ROUNDS):
        ranks = (
            edges.join(ranks, edges["u"] == ranks["rv"])
            .select("v", F.expr("(r div d)").alias("contrib"))
            .groupBy("v")
            .agg(
                (F.lit(150000) + F.expr("(sum(contrib) * 85) div 100"))
                .cast("bigint")
                .alias("r")
            )
            .select(F.col("v").alias("rv"), "r")
            .localCheckpoint(eager=True)
        )
    return ranks.select(F.col("rv").alias("part"), F.col("r").alias("pagerank_micro"))


# ---------------------------------------------------------------------------
# q154 — declarative data-quality constraint audit
# ---------------------------------------------------------------------------

_AUDIT_ORACLE = """
SELECT 'orphan_lineitem' AS constraint_name,
       (SELECT COUNT(*) FROM lineitem l WHERE NOT EXISTS
          (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)) AS n_violations,
       (SELECT COUNT(*) FROM lineitem) AS n_checked
UNION ALL
SELECT 'pk_duplicate_part',
       (SELECT COUNT(*) - COUNT(DISTINCT p_partkey) FROM part),
       (SELECT COUNT(*) FROM part)
UNION ALL
SELECT 'null_props_events',
       (SELECT COUNT(*) FROM events WHERE props IS NULL),
       (SELECT COUNT(*) FROM events)
UNION ALL
SELECT 'discount_range_lineitem',
       (SELECT COUNT(*) FROM lineitem WHERE l_discount < 0 OR l_discount > 0.1),
       (SELECT COUNT(*) FROM lineitem)
UNION ALL
SELECT 'nonpositive_qty_lineitem',
       (SELECT COUNT(*) FROM lineitem WHERE l_quantity <= 0),
       (SELECT COUNT(*) FROM lineitem)
"""


@query("q154_constraint_audit", oracle=_AUDIT_ORACLE)
def q154_constraint_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative data-quality audit — the dbt-tests / Deequ shape:
    referential integrity (orphan facts via anti join), primary-key
    uniqueness, null-rate, and accepted-range constraints, reported as
    one (constraint, n_violations, n_checked) frame a scheduler can
    alert on.

    Scale: every constraint is a scan+agg (the anti join broadcasts
    the key side or rides AQE at fact-fact size); constraints over the
    same table share one scan via Spark's plan-level scan reuse. At
    100 TB, run per-partition and sum — counts compose exactly.
    """
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    p = load_table(spark, sf_dir, "part")
    e = load_table(spark, sf_dir, "events")

    def one(name: str, viol, total) -> DataFrame:
        return viol.crossJoin(total).select(
            F.lit(name).alias("constraint_name"),
            F.col("v").cast("bigint").alias("n_violations"),
            F.col("t").cast("bigint").alias("n_checked"),
        )

    orphans = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"], "left_anti")
        .agg(F.count(F.lit(1)).alias("v"))
    )
    checks = [
        one("orphan_lineitem", orphans, li.agg(F.count(F.lit(1)).alias("t"))),
        one(
            "pk_duplicate_part",
            p.agg((F.count(F.lit(1)) - F.count_distinct("p_partkey")).alias("v")),
            p.agg(F.count(F.lit(1)).alias("t")),
        ),
        one(
            "null_props_events",
            e.agg(F.sum(F.col("props").isNull().cast("bigint")).alias("v")),
            e.agg(F.count(F.lit(1)).alias("t")),
        ),
        one(
            "discount_range_lineitem",
            li.agg(
                F.sum(
                    ((F.col("l_discount") < 0) | (F.col("l_discount") > 0.1)).cast(
                        "bigint"
                    )
                ).alias("v")
            ),
            li.agg(F.count(F.lit(1)).alias("t")),
        ),
        one(
            "nonpositive_qty_lineitem",
            li.agg(F.sum((F.col("l_quantity") <= 0).cast("bigint")).alias("v")),
            li.agg(F.count(F.lit(1)).alias("t")),
        ),
    ]
    out = checks[0]
    for c in checks[1:]:
        out = out.unionByName(c)
    return out


# ---------------------------------------------------------------------------
# q156 — deletion propagation (right-to-be-forgotten cascade manifest)
# ---------------------------------------------------------------------------

_DEL_ORACLE = """
WITH del_users AS (SELECT c_custkey FROM customer WHERE c_custkey % 53 = 0),
del_orders AS (SELECT o_orderkey FROM orders
               WHERE o_custkey IN (SELECT c_custkey FROM del_users))
SELECT 'customer' AS table_name,
       (SELECT COUNT(*) FROM del_users) AS n_deleted,
       (SELECT COUNT(*) FROM customer) AS n_before
UNION ALL
SELECT 'orders', (SELECT COUNT(*) FROM del_orders),
       (SELECT COUNT(*) FROM orders)
UNION ALL
SELECT 'lineitem',
       (SELECT COUNT(*) FROM lineitem
        WHERE l_orderkey IN (SELECT o_orderkey FROM del_orders)),
       (SELECT COUNT(*) FROM lineitem)
UNION ALL
SELECT 'events',
       (SELECT COUNT(*) FROM events
        WHERE user_id IN (SELECT c_custkey FROM del_users)),
       (SELECT COUNT(*) FROM events)
"""


@query("q156_deletion_propagation", oracle=_DEL_ORACLE)
def q156_deletion_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right-to-be-forgotten cascade: given a deletion set of users,
    the manifest of rows each downstream table must drop — customers,
    their orders, those orders' lineitems, and the users' events —
    with before-counts for the audit trail. The planning half of a
    GDPR delete at lakehouse scale; the execution half is an anti
    join per table writing new file versions.

    Scale: each cascade level is one semi join against the (small)
    key set of the previous level — broadcast all the way down, no
    fact-fact shuffle. Per-table counts compose across partitions, so
    the manifest can be produced partition-parallel and summed.
    """
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    e = load_table(spark, sf_dir, "events")

    del_users = c.filter(F.col("c_custkey") % 53 == 0).select("c_custkey")
    del_orders = o.join(
        F.broadcast(del_users), o["o_custkey"] == del_users["c_custkey"], "left_semi"
    ).select("o_orderkey")

    def row(name: str, deleted: DataFrame, full: DataFrame) -> DataFrame:
        return (
            deleted.agg(F.count(F.lit(1)).alias("v"))
            .crossJoin(full.agg(F.count(F.lit(1)).alias("t")))
            .select(
                F.lit(name).alias("table_name"),
                F.col("v").cast("bigint").alias("n_deleted"),
                F.col("t").cast("bigint").alias("n_before"),
            )
        )

    del_li = li.join(
        F.broadcast(del_orders), li["l_orderkey"] == del_orders["o_orderkey"], "left_semi"
    )
    del_e = e.join(
        F.broadcast(del_users), e["user_id"] == del_users["c_custkey"], "left_semi"
    )
    out = row("customer", del_users, c)
    for name, d_, f_ in (("orders", del_orders, o), ("lineitem", del_li, li), ("events", del_e, e)):
        out = out.unionByName(row(name, d_, f_))
    return out


# ---------------------------------------------------------------------------
# q157 — temporal validity join (facts against an SCD2-versioned dim)
# ---------------------------------------------------------------------------

_TEMPORAL_ORACLE = """
WITH vraw AS (
  SELECT user_id, ts, CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS vc,
         ROW_NUMBER() OVER (PARTITION BY user_id, ts ORDER BY event_id DESC) AS rn
  FROM events WHERE event_id % 20 = 0),
v AS (SELECT user_id, ts, vc FROM vraw WHERE rn = 1),
f AS (SELECT user_id, ts, event_id FROM events WHERE event_id % 20 <> 0)
SELECT f.user_id, COUNT(*) AS n_facts, COUNT(v.vc) AS n_matched,
       CAST(COALESCE(SUM(v.vc), 0) AS BIGINT) AS sum_matched_vc
FROM f ASOF LEFT JOIN v ON f.user_id = v.user_id AND v.ts <= f.ts
GROUP BY f.user_id
"""


@query("q157_temporal_validity_join", oracle=_TEMPORAL_ORACLE)
def q157_temporal_validity_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join facts to the dimension version VALID AT each fact's event
    time — the warehouse temporal join against an SCD2 history (q131
    builds one; here versions are each user's %20-sampled events).
    Every fact picks the latest version with version_ts <= fact_ts;
    facts before any version stay unmatched (left semantics).

    Implementation is the union/as-of shape (operators/asof.py), not a
    range join: versions and facts union into one stream, one ordered
    window per user carries the active version forward (last non-null
    with versions sorting before facts on ts ties), and facts read it.
    One shuffle on the entity key; no interval explosion, no
    BroadcastNestedLoopJoin — the only temporal-join layout that
    survives a billion-fact day. DuckDB's native ASOF JOIN is the
    oracle.
    """
    e = load_table(spark, sf_dir, "events")
    cents = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint")
    vdup = W.partitionBy("user_id", "ts").orderBy(F.desc("event_id"))
    versions = (
        e.filter(F.col("event_id") % 20 == 0)
        .withColumn("rn", F.row_number().over(vdup))
        .filter(F.col("rn") == 1)
        .select(
            "user_id", "ts", F.lit(0).alias("is_fact"), F.lit(None).cast("bigint").alias("event_id2"),
            cents.alias("vc"),
        )
    )
    facts = e.filter(F.col("event_id") % 20 != 0).select(
        "user_id", "ts", F.lit(1).alias("is_fact"), F.col("event_id").alias("event_id2"),
        F.lit(None).cast("bigint").alias("vc"),
    )
    merged = versions.unionByName(facts)
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "is_fact", "event_id2")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    carried = merged.withColumn("active_vc", F.last("vc", ignorenulls=True).over(w))
    out_facts = carried.filter(F.col("is_fact") == 1)
    return out_facts.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_facts"),
        F.count("active_vc").alias("n_matched"),
        F.coalesce(F.sum("active_vc"), F.lit(0)).cast("bigint").alias("sum_matched_vc"),
    )


# ---------------------------------------------------------------------------
# q158 — merge-on-read with deletion vectors (Iceberg/Delta DV shape)
# ---------------------------------------------------------------------------

_MOR_ORACLE = f"""
WITH hashed AS (
  SELECT l_orderkey, l_linenumber,
         MD5(CONCAT_WS('|', l_orderkey, l_linenumber, l_quantity)) AS h
  FROM lineitem),
base AS (
  SELECT l_orderkey % 8 AS file_id,
         ROW_NUMBER() OVER (PARTITION BY l_orderkey % 8
                            ORDER BY l_orderkey, l_linenumber, h) AS pos,
         h
  FROM hashed),
survivors AS (SELECT * FROM base WHERE pos % 37 <> 0),
totals AS (SELECT file_id, COUNT(*) AS n_total FROM base GROUP BY file_id),
live AS (SELECT file_id, COUNT(*) AS n_live,
                CAST(SUM({_NIBBLES}) AS BIGINT) AS live_checksum
         FROM survivors GROUP BY file_id)
SELECT live.file_id, n_live, n_total - n_live AS n_deleted, live_checksum
FROM live JOIN totals ON live.file_id = totals.file_id
"""


@query("q158_merge_on_read", oracle=_MOR_ORACLE)
def q158_merge_on_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merge-on-read with positional deletion vectors — the
    Iceberg v2 / Delta DV mechanism: deletes write (file, position)
    tombstones instead of rewriting data files, and every read
    subtracts the deletion vector from its file's rows. Simulated
    here: files are hash buckets, positions are in-file row numbers,
    the DV is the pos%37 set; the read reports per-file live/deleted
    counts plus a content checksum (q140's) of surviving rows,
    proving the subtraction applied row-exactly.

    Scale: the anti-semantics are per-file and positional, so the
    merge never shuffles data — each task subtracts its own file's DV
    (here: a filter; in a real table a hash lookup against that
    file's tombstone set). Compaction (q146's packing) eventually
    rewrites files whose DV grows past a threshold.
    """
    li = load_table(spark, sf_dir, "lineitem")
    hashed = li.select(
        "l_orderkey",
        "l_linenumber",
        F.md5(
            F.concat_ws("|", "l_orderkey", "l_linenumber", "l_quantity").cast("binary")
        ).alias("h"),
    )
    # (l_orderkey, l_linenumber) is NOT unique in the synthetic fixture;
    # the row hash breaks ties into a total order (identical-h ties are
    # harmless — swapping identical rows can't change any aggregate).
    pos_w = W.partitionBy(F.col("l_orderkey") % 8).orderBy(
        "l_orderkey", "l_linenumber", "h"
    )
    base = hashed.select(
        (F.col("l_orderkey") % 8).alias("file_id"),
        F.row_number().over(pos_w).alias("pos"),
        "h",
    )
    totals = base.groupBy("file_id").agg(F.count(F.lit(1)).alias("n_total"))
    survivors = base.filter(F.col("pos") % 37 != 0)
    live = survivors.groupBy("file_id").agg(
        F.count(F.lit(1)).alias("n_live"),
        F.sum(F.expr(_NIBBLES)).cast("bigint").alias("live_checksum"),
    )
    return live.join(F.broadcast(totals), "file_id").select(
        "file_id",
        "n_live",
        (F.col("n_total") - F.col("n_live")).alias("n_deleted"),
        "live_checksum",
    )


# ---------------------------------------------------------------------------
# q161 — per-entity least-squares trend slope (exact moment sums)
# ---------------------------------------------------------------------------

_TREND_ORACLE = """
WITH pts AS (
  SELECT user_id,
         EPOCH_US(ts) // 1000000 AS x,
         CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS y
  FROM events),
mom AS (
  SELECT user_id, COUNT(*) AS n,
         SUM(CAST(x AS HUGEINT)) AS sx, SUM(CAST(y AS HUGEINT)) AS sy,
         SUM(CAST(x AS HUGEINT) * y) AS sxy, SUM(CAST(x AS HUGEINT) * x) AS sxx
  FROM pts GROUP BY user_id)
SELECT user_id, n,
       CAST(FLOOR(1e6 * ((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                          - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                         / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                            - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))) + 0.5)
         AS BIGINT) AS slope_micro
FROM mom WHERE n >= 2
"""


@query("q161_trend_slope", oracle=_TREND_ORACLE)
def q161_trend_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-sensor least-squares trend: slope of value (cents) against
    time (whole seconds) from the closed form n·Σxy − Σx·Σy over
    n·Σx² − (Σx)² — drift detection for telemetry (is this bearing's
    temperature creeping up?). The four moment sums accumulate exactly
    in integers (decimal(38,0): Σx² at epoch scale overflows bigint),
    and the slope is one mirrored double sequence at the end.

    Scale: a single map-side-partial aggregation — 4 integer sums and
    a count per entity; no window, no sort, one vocab-of-entities
    exchange. The same moment layout yields intercept, r², and
    variance with zero extra passes (q123's correlation pattern).
    """
    e = load_table(spark, sf_dir, "events")
    x = F.expr("unix_micros(cast(ts as timestamp)) div 1000000")
    y = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint")
    pts = e.select("user_id", x.alias("x"), y.alias("y"))
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    mom = pts.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(dec(F.col("x"))).alias("sx"),
        F.sum(dec(F.col("y"))).alias("sy"),
        F.sum(dec(F.col("x") * F.col("y"))).alias("sxy"),
        F.sum(dec(F.col("x") * F.col("x"))).alias("sxx"),
    )
    nd = F.col("n").cast("double")
    num = nd * F.col("sxy").cast("double") - F.col("sx").cast("double") * F.col(
        "sy"
    ).cast("double")
    den = nd * F.col("sxx").cast("double") - F.col("sx").cast("double") * F.col(
        "sx"
    ).cast("double")
    return mom.filter(F.col("n") >= 2).select(
        "user_id",
        "n",
        F.floor(F.lit(1e6) * (num / den) + F.lit(0.5)).cast("bigint").alias("slope_micro"),
    )


# ---------------------------------------------------------------------------
# q162 — A-priori frequent triples (candidate-pruned itemset mining)
# ---------------------------------------------------------------------------

_TRIPLE_SUPPORT = 2

_TRIPLES_ORACLE = f"""
WITH items AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem)
SELECT a.l_partkey AS pa, b.l_partkey AS pb, c.l_partkey AS pc,
       COUNT(*) AS support
FROM items a
JOIN items b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
JOIN items c ON a.l_orderkey = c.l_orderkey AND b.l_partkey < c.l_partkey
GROUP BY pa, pb, pc HAVING COUNT(*) >= {_TRIPLE_SUPPORT}
"""


@query("q162_frequent_triples", oracle=_TRIPLES_ORACLE)
def q162_frequent_triples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequent 3-itemsets with support >= 2, mined A-priori style:
    frequent pairs (support >= 2) are computed first, and the triple
    enumeration joins only pairs that both survived — the downward-
    closure pruning that keeps k-itemset mining feasible when the raw
    C(n,3) blowup doesn't. The oracle brute-forces the 3-way self-join
    (correct but unpruned); identical results prove the pruning is
    lossless, which is A-priori's theorem.

    Scale: the basket self-joins key on the basket id, so candidate
    generation never leaves a basket's partition; the pruning semi
    joins broadcast the frequent-pair list (sublinear in baskets).
    Each k→k+1 round is the same shape — the loop structure of
    distributed FP-growth alternatives.
    """
    from kinesis_producer_spark.operators.baskets import ordered_item_pairs

    li = load_table(spark, sf_dir, "lineitem")
    items = li.select("l_orderkey", "l_partkey").distinct()
    pairs = ordered_item_pairs(li, "l_orderkey", "l_partkey", out=("ok", "pa", "pb"))
    freq_pairs = (
        pairs.groupBy("pa", "pb")
        .agg(F.count(F.lit(1)).alias("s"))
        .filter(F.col("s") >= _TRIPLE_SUPPORT)
        .select("pa", "pb")
    )
    # downward closure: a frequent triple's (pa,pb) and (pa,pc) and
    # (pb,pc) sub-pairs are all frequent — prune candidates to pairs
    # that survived, then extend with a third basket item.
    surviving = pairs.join(F.broadcast(freq_pairs), ["pa", "pb"], "left_semi")
    c = items.alias("c")
    cand = surviving.join(
        c,
        (F.col("ok") == F.col("c.l_orderkey")) & (F.col("pb") < F.col("c.l_partkey")),
    ).select("ok", "pa", "pb", F.col("c.l_partkey").alias("pc"))
    cand = cand.join(
        F.broadcast(freq_pairs.toDF("pa", "pc")), ["pa", "pc"], "left_semi"
    ).join(F.broadcast(freq_pairs.toDF("pb", "pc")), ["pb", "pc"], "left_semi")
    return (
        cand.groupBy("pa", "pb", "pc")
        .agg(F.count(F.lit(1)).alias("support"))
        .filter(F.col("support") >= _TRIPLE_SUPPORT)
    )


# ---------------------------------------------------------------------------
# q163 — triangle counting via degree-ordered edge orientation
# ---------------------------------------------------------------------------

_TRIANGLES_ORACLE = """
WITH base AS (
  WITH items AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
  pairs AS (SELECT a.l_partkey AS a, b.l_partkey AS b
            FROM items a JOIN items b
              ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey)
  SELECT a, b FROM pairs GROUP BY a, b HAVING COUNT(*) >= 2)
SELECT COUNT(*) AS n_triangles FROM base e1
JOIN base e2 ON e1.b = e2.a
JOIN base e3 ON e3.a = e1.a AND e3.b = e2.b
"""


@query("q163_triangle_count", oracle=_TRIANGLES_ORACLE)
def q163_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle count of the co-purchase graph — the clustering-
    coefficient numerator. Edges are oriented low-id → high-id, so
    each triangle is counted exactly once as (a<b<c): join edges
    (a,b)⋈(b,c) into wedges, then close each wedge against the edge
    list.

    Scale: the orientation bounds wedge generation by out-degree
    under the total order, not raw degree (the classic heavy-hitter
    fix is ordering by degree instead of id — same plan, different
    orientation key); the closing step is an equi semi join on the
    full edge pair. Both joins key on vertex ids — hash-partitioned,
    no nested loops (audited).
    """
    from kinesis_producer_spark.operators.baskets import ordered_item_pairs

    li = load_table(spark, sf_dir, "lineitem")
    edges = (
        ordered_item_pairs(li, "l_orderkey", "l_partkey", out=("ok", "u", "v"))
        .groupBy("u", "v")
        .agg(F.count(F.lit(1)).alias("w"))
        .filter(F.col("w") >= 2)
        .select("u", "v")
    )
    e1 = edges.toDF("x", "y")
    e2 = edges.toDF("y", "z")
    wedges = e1.join(e2, "y").select("x", "y", "z")
    closed = wedges.join(
        edges.toDF("x", "z"), ["x", "z"], "left_semi"
    )
    return closed.agg(F.count(F.lit(1)).cast("bigint").alias("n_triangles"))


# ---------------------------------------------------------------------------
# q164 — ANALYZE-style per-column statistics collector
# ---------------------------------------------------------------------------

_ANALYZE_COLS = [
    ("l_orderkey", "CAST(l_orderkey AS VARCHAR)"),
    ("l_partkey", "CAST(l_partkey AS VARCHAR)"),
    ("l_returnflag", "l_returnflag"),
    ("l_linestatus", "l_linestatus"),
    ("l_shipdate", "CAST(l_shipdate AS VARCHAR)"),
]

_ANALYZE_ORACLE = "\nUNION ALL\n".join(
    f"""SELECT '{name}' AS column_name,
       COUNT(*) AS n_rows,
       COUNT({expr}) AS n_nonnull,
       COUNT(DISTINCT {expr}) AS ndv,
       MIN({expr}) AS min_str,
       MAX({expr}) AS max_str,
       CAST(SUM(LENGTH({expr})) AS BIGINT) AS sum_len
FROM lineitem"""
    for name, expr in _ANALYZE_COLS
)


@query("q164_analyze_stats", oracle=_ANALYZE_ORACLE)
def q164_analyze_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ANALYZE TABLE shape: per-column row/non-null/NDV counts,
    min/max, and total byte length — the statistics a cost-based
    optimizer (and a zone-map writer, q138) feeds on. Values are
    canonicalized to strings so one frame carries every column's
    stats; timestamps render identically in both engines via the
    ISO-like cast.

    Scale: one scan per column group here for oracle clarity; the
    production layout computes all columns in a single pass
    (struct-of-aggregates per column) and NDV switches to
    approx_count_distinct (error-bound pinned in tests) or the
    mergeable KMV sketch (q145) — exact COUNT(DISTINCT) over 100 TB
    per column is the one piece that doesn't scale.
    """
    li = load_table(spark, sf_dir, "lineitem")
    casts = {
        "l_orderkey": F.col("l_orderkey").cast("string"),
        "l_partkey": F.col("l_partkey").cast("string"),
        "l_returnflag": F.col("l_returnflag"),
        "l_linestatus": F.col("l_linestatus"),
        "l_shipdate": F.col("l_shipdate").cast("string"),
    }
    outs = []
    for name, c in casts.items():
        outs.append(
            li.select(c.alias("v")).agg(
                F.lit(name).alias("column_name"),
                F.count(F.lit(1)).alias("n_rows"),
                F.count("v").alias("n_nonnull"),
                F.count_distinct("v").alias("ndv"),
                F.min("v").alias("min_str"),
                F.max("v").alias("max_str"),
                F.sum(F.length("v")).cast("bigint").alias("sum_len"),
            )
        )
    out = outs[0]
    for o_ in outs[1:]:
        out = out.unionByName(o_)
    return out


# ---------------------------------------------------------------------------
# q165 — A/B experiment readout with exact pooled variance
# ---------------------------------------------------------------------------

_AB_ORACLE = """
WITH per_user AS (
  SELECT user_id,
         INSTR('0123456789abcdef', SUBSTR(MD5('ab:' || CAST(user_id AS VARCHAR)), 1, 1))
           % 2 AS arm,
         SUM(CAST(FLOOR(value * 100 + 0.5) AS HUGEINT)) AS cents
  FROM events GROUP BY user_id),
mom AS (
  SELECT arm, COUNT(*) AS n,
         SUM(cents) AS s1, SUM(cents * cents) AS s2
  FROM per_user GROUP BY arm)
SELECT arm, n,
       CAST(FLOOR(CAST(s1 AS DOUBLE) / n + 0.5) AS BIGINT) AS mean_cents,
       CASE WHEN n <= 1 THEN NULL
            ELSE CAST(FLOOR((CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / n)
                       / (n - 1) + 0.5) AS BIGINT) END AS var_cents2
FROM mom
"""


@query("q165_ab_experiment", oracle=_AB_ORACLE)
def q165_ab_experiment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A/B experiment readout: users hash-split into two arms (the
    same rand()-free assignment discipline as q70 — stable under
    retries and re-runs), per-user value totals, then per-arm n /
    mean / sample variance from exact integer moments — the inputs a
    t-test needs, with the variance computed as (Σx² − (Σx)²/n)/(n−1)
    in one mirrored double sequence.

    Scale: two aggregations, both map-side-partial — user totals key
    on user_id, arm moments on the 2-value arm key. No experiment
    framework dependency: assignment is a pure function of the id, so
    any table with a user column gets the same split everywhere.
    """
    e = load_table(spark, sf_dir, "events")
    arm = F.expr(
        "instr('0123456789abcdef', substr(md5(cast('ab:' || cast(user_id as string) as binary)), 1, 1)) % 2"
    )
    per_user = (
        e.groupBy("user_id")
        .agg(
            F.sum(
                F.floor(F.col("value") * 100 + F.lit(0.5)).cast("decimal(38,0)")
            ).alias("cents")
        )
        .select(arm.alias("arm"), "cents")
    )
    mom = per_user.groupBy("arm").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("cents").alias("s1"),
        F.sum(F.col("cents") * F.col("cents")).alias("s2"),
    )
    s1d = F.col("s1").cast("double")
    return mom.select(
        "arm",
        "n",
        F.floor(s1d / F.col("n") + F.lit(0.5)).cast("bigint").alias("mean_cents"),
        # n=1 arm: (n-1)=0 — div-by-zero semantics differ across
        # engines, so both take the explicit NULL branch
        F.when(F.col("n") <= 1, F.lit(None).cast("bigint"))
        .otherwise(
            F.floor(
                (F.col("s2").cast("double") - s1d * s1d / F.col("n")) / (F.col("n") - 1)
                + F.lit(0.5)
            ).cast("bigint")
        )
        .alias("var_cents2"),
    )


# ---------------------------------------------------------------------------
# q166 — join-explosion detector (pre-join cardinality diagnostics)
# ---------------------------------------------------------------------------

_EXPLOSION_ORACLE = """
WITH l AS (SELECT l_partkey AS k, COUNT(*) AS nl FROM lineitem GROUP BY 1),
r AS (SELECT l_suppkey AS k, COUNT(*) AS nr FROM lineitem GROUP BY 1),
j AS (SELECT l.k, nl, nr, CAST(nl AS BIGINT) * nr AS out_rows
      FROM l JOIN r ON l.k = r.k)
SELECT k, nl, nr, out_rows,
       CAST(ROW_NUMBER() OVER (ORDER BY out_rows DESC, k) AS BIGINT) AS rank
FROM j ORDER BY out_rows DESC, k LIMIT 10
"""


@query("q166_join_explosion_detector", oracle=_EXPLOSION_ORACLE)
def q166_join_explosion_detector(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pre-join cardinality diagnostic: for a prospective equi-join
    (here lineitem.partkey against lineitem.suppkey as a stand-in
    pair), the per-key left-count x right-count product — the exact
    number of output rows each key will generate. The top offenders
    tell you BEFORE running the join whether it explodes, and which
    keys need salting (q27) or pre-aggregation.

    Scale: two key-count aggs (map-side partials) and a join between
    the two count frames — key-cardinality sized, never data sized.
    This is what a CBO's estimated-cardinality check does, made
    explicit and exact; run it as a gate in pipelines that join
    user-supplied data.
    """
    li = load_table(spark, sf_dir, "lineitem")
    l = li.groupBy(F.col("l_partkey").alias("k")).agg(F.count(F.lit(1)).alias("nl"))
    r = li.groupBy(F.col("l_suppkey").alias("k")).agg(F.count(F.lit(1)).alias("nr"))
    j = l.join(r, "k").select(
        "k", "nl", "nr", (F.col("nl").cast("bigint") * F.col("nr")).alias("out_rows")
    )
    top = j.orderBy(F.desc("out_rows"), F.asc("k")).limit(10)
    return top.withColumn(
        "rank",
        F.row_number().over(W.orderBy(F.desc("out_rows"), F.asc("k"))).cast("bigint"),
    )


# ---------------------------------------------------------------------------
# q167 — shuffle-skew profiler (feeds the salting decision)
# ---------------------------------------------------------------------------

_SKEW_ORACLE = """
WITH bucketed AS (
  SELECT (INSTR('0123456789abcdef', SUBSTR(MD5(CAST(o_custkey AS VARCHAR)), 1, 1)) - 1)
           * 16
         + INSTR('0123456789abcdef', SUBSTR(MD5(CAST(o_custkey AS VARCHAR)), 2, 1)) - 1
           AS bucket
  FROM orders),
counts AS (SELECT bucket, COUNT(*) AS n FROM bucketed GROUP BY bucket)
SELECT COUNT(*) AS n_buckets,
       CAST(SUM(n) AS BIGINT) AS n_rows,
       CAST(MAX(n) AS BIGINT) AS max_bucket,
       CAST(FLOOR(CAST(SUM(n) AS DOUBLE) / COUNT(*) + 0.5) AS BIGINT) AS mean_bucket,
       CAST(FLOOR(1e6 * CAST(MAX(n) AS DOUBLE)
                  / (CAST(SUM(n) AS DOUBLE) / COUNT(*)) + 0.5) AS BIGINT)
         AS skew_ratio_micro
FROM counts
"""


@query("q167_skew_profile", oracle=_SKEW_ORACLE)
def q167_skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shuffle-skew profile for a prospective partitioning key: rows
    are bucketed by the first byte of the key's md5 (256 reducers in
    miniature) and the report gives max-vs-mean bucket load — the
    skew ratio that decides between plain hash partitioning, AQE skew
    splitting, and explicit salting (q27). A ratio near 1e6 (1.0x)
    means balanced; hot keys push it up in direct proportion to the
    straggler they would create.

    Scale: one 256-key agg with map-side partials, then a 256-row
    reduction — the profile costs one scan regardless of table size
    and predicts reducer balance without running the shuffle.
    """
    o = load_table(spark, sf_dir, "orders")
    nib = lambda i: F.expr(  # noqa: E731
        f"instr('0123456789abcdef', substr(md5(cast(cast(o_custkey as string) as binary)), {i}, 1)) - 1"
    )
    bucketed = o.select(((nib(1) * 16) + nib(2)).alias("bucket"))
    counts = bucketed.groupBy("bucket").agg(F.count(F.lit(1)).alias("n"))
    mean = F.sum("n").cast("double") / F.count(F.lit(1))
    return counts.agg(
        F.count(F.lit(1)).alias("n_buckets"),
        F.sum("n").cast("bigint").alias("n_rows"),
        F.max("n").cast("bigint").alias("max_bucket"),
        F.floor(mean + F.lit(0.5)).cast("bigint").alias("mean_bucket"),
        F.floor(F.lit(1e6) * F.max("n").cast("double") / mean + F.lit(0.5))
        .cast("bigint")
        .alias("skew_ratio_micro"),
    )


# ---------------------------------------------------------------------------
# q174 — sampled join-cardinality estimation vs exact (CBO-style)
# ---------------------------------------------------------------------------

_SAMPLE_MOD = 16

_EST_ORACLE = f"""
WITH ls AS (SELECT l_orderkey FROM lineitem
            WHERE INSTR('0123456789abcdef',
                        SUBSTR(MD5('s:' || CAST(l_orderkey AS VARCHAR)), 1, 1)) - 1 = 0),
est AS (SELECT CAST(COUNT(*) AS BIGINT) * {_SAMPLE_MOD} AS est_rows
        FROM ls JOIN orders ON l_orderkey = o_orderkey),
ex AS (SELECT CAST(COUNT(*) AS BIGINT) AS exact_rows
       FROM lineitem JOIN orders ON l_orderkey = o_orderkey)
SELECT est_rows, exact_rows,
       CAST(FLOOR(1e6 * ABS(CAST(est_rows AS DOUBLE) - CAST(exact_rows AS DOUBLE))
                  / CAST(exact_rows AS DOUBLE) + 0.5) AS BIGINT) AS rel_err_micro
FROM est CROSS JOIN ex
"""


@query("q174_sampled_join_estimate", oracle=_EST_ORACLE)
def q174_sampled_join_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CBO-style join-size estimation by correlated sampling: join a
    deterministic 1/16 hash sample OF THE JOIN KEY against the full
    other side and scale up. Sampling on the key (not on rows) keeps
    every sampled key's full multiplicity, so the estimate is unbiased
    for key-multiplicative joins — row-Bernoulli sampling of both
    sides would need a 1/p² correction and much more variance. The
    exact count and realized relative error ride along in the result.

    Scale: the sample predicate is a pushed-down map-side filter
    (md5 nibble gate, retry-stable like every sample here); the
    estimate join touches 1/16 of one side. This is the measured
    version of what q166 predicts from per-key counts.
    """
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    gate = (
        F.expr(
            "instr('0123456789abcdef', substr(md5(cast('s:' || cast(l_orderkey as string) as binary)), 1, 1)) - 1"
        )
        == 0
    )
    ls = li.filter(gate).select("l_orderkey")
    est = (
        ls.join(o, ls["l_orderkey"] == o["o_orderkey"])
        .agg((F.count(F.lit(1)).cast("bigint") * _SAMPLE_MOD).alias("est_rows"))
    )
    ex = li.join(o, li["l_orderkey"] == o["o_orderkey"]).agg(
        F.count(F.lit(1)).cast("bigint").alias("exact_rows")
    )
    out = est.crossJoin(ex)
    rel = F.floor(
        F.lit(1e6)
        * F.abs(F.col("est_rows").cast("double") - F.col("exact_rows").cast("double"))
        / F.col("exact_rows").cast("double")
        + F.lit(0.5)
    ).cast("bigint")
    return out.select("est_rows", "exact_rows", rel.alias("rel_err_micro"))


# ---------------------------------------------------------------------------
# q175 — dimension snapshot diff (day-over-day change report)
# ---------------------------------------------------------------------------

_SNAPDIFF_ORACLE = """
WITH v1 AS (SELECT s_suppkey, CAST(FLOOR(s_acctbal * 100 + 0.5) AS BIGINT) AS bal
            FROM supplier WHERE s_suppkey % 13 <> 0),
v2 AS (SELECT s_suppkey,
              CASE WHEN s_suppkey % 7 = 0
                   THEN CAST(FLOOR(s_acctbal * 100 + 0.5) AS BIGINT) + 100
                   ELSE CAST(FLOOR(s_acctbal * 100 + 0.5) AS BIGINT) END AS bal
       FROM supplier WHERE s_suppkey % 11 <> 0)
SELECT 'added' AS change, CAST(COUNT(*) AS BIGINT) AS n FROM v2
WHERE s_suppkey NOT IN (SELECT s_suppkey FROM v1)
UNION ALL
SELECT 'removed', CAST(COUNT(*) AS BIGINT) FROM v1
WHERE s_suppkey NOT IN (SELECT s_suppkey FROM v2)
UNION ALL
SELECT 'changed', CAST(COUNT(*) AS BIGINT)
FROM v1 JOIN v2 USING (s_suppkey) WHERE v1.bal <> v2.bal
UNION ALL
SELECT 'unchanged', CAST(COUNT(*) AS BIGINT)
FROM v1 JOIN v2 USING (s_suppkey) WHERE v1.bal = v2.bal
"""


@query("q175_snapshot_diff", oracle=_SNAPDIFF_ORACLE)
def q175_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-over-day dimension snapshot diff: added / removed /
    changed / unchanged counts between two versions of the supplier
    dim (deterministically derived: %13 keys absent yesterday, %11
    absent today, %7 balances revised) — the report every nightly dim
    load emits before the SCD2 merge (q131) applies it.

    Scale: one full-outer-shaped comparison on the key; here
    expressed as anti joins for adds/removes and an inner join for
    value comparison, each a single key exchange. At dim sizes these
    broadcast; at fact sizes they ride co-partitioning (cf. q140's
    checksum approach when the diff only needs to LOCATE divergence,
    not enumerate it).
    """
    s = load_table(spark, sf_dir, "supplier")
    bal = F.floor(F.col("s_acctbal") * 100 + F.lit(0.5)).cast("bigint")
    v1 = s.filter(F.col("s_suppkey") % 13 != 0).select("s_suppkey", bal.alias("bal"))
    v2 = s.filter(F.col("s_suppkey") % 11 != 0).select(
        "s_suppkey",
        F.when(F.col("s_suppkey") % 7 == 0, bal + 100).otherwise(bal).alias("bal"),
    )
    added = v2.join(v1, "s_suppkey", "left_anti").agg(
        F.lit("added").alias("change"), F.count(F.lit(1)).cast("bigint").alias("n")
    )
    removed = v1.join(v2, "s_suppkey", "left_anti").agg(
        F.lit("removed").alias("change"), F.count(F.lit(1)).cast("bigint").alias("n")
    )
    both = v1.alias("a").join(v2.alias("b"), "s_suppkey")
    changed = both.filter(F.col("a.bal") != F.col("b.bal")).agg(
        F.lit("changed").alias("change"), F.count(F.lit(1)).cast("bigint").alias("n")
    )
    unchanged = both.filter(F.col("a.bal") == F.col("b.bal")).agg(
        F.lit("unchanged").alias("change"), F.count(F.lit(1)).cast("bigint").alias("n")
    )
    return added.unionByName(removed).unionByName(changed).unionByName(unchanged)


# ---------------------------------------------------------------------------
# q176 — per-entity freshness / staleness report
# ---------------------------------------------------------------------------

_FRESH_ORACLE = """
WITH per_user AS (
  SELECT user_id, MAX(ts) AS last_ts, COUNT(*) AS n_events FROM events GROUP BY user_id),
g AS (SELECT MAX(last_ts) AS global_max FROM per_user)
SELECT CAST((EPOCH_US(global_max) - EPOCH_US(last_ts)) // 3600000000 AS BIGINT)
         AS hours_stale,
       CAST(COUNT(*) AS BIGINT) AS n_entities,
       CAST(SUM(n_events) AS BIGINT) AS n_events
FROM per_user CROSS JOIN g
GROUP BY 1
"""


@query("q176_freshness_report", oracle=_FRESH_ORACLE)
def q176_freshness_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ingest freshness histogram: per entity, hours since its last
    event relative to the stream head, bucketed — the lag report that
    distinguishes 'pipeline is healthy' from 'these 40 sensors went
    quiet yesterday' (q152 finds historical gaps; this measures NOW).

    Scale: per-entity max is one map-side-partial agg; the stream
    head is a 1-row broadcast; the histogram keys on the staleness
    bucket. Three exchanges totalling |entities| + buckets rows.
    """
    e = load_table(spark, sf_dir, "events")
    per_user = e.groupBy("user_id").agg(
        F.max("ts").alias("last_ts"), F.count(F.lit(1)).alias("n_events")
    )
    g = per_user.agg(F.max("last_ts").alias("global_max"))
    stale = F.expr(
        "(unix_micros(cast(global_max as timestamp)) - unix_micros(cast(last_ts as timestamp)))"
        " div 3600000000"
    )
    return (
        per_user.crossJoin(F.broadcast(g))
        .select(stale.alias("hours_stale"), "n_events")
        .groupBy("hours_stale")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_entities"),
            F.sum("n_events").cast("bigint").alias("n_events"),
        )
    )


# ---------------------------------------------------------------------------
# q183 — log2-binned histogram (portable, no floating log)
# ---------------------------------------------------------------------------

_LOGHIST_ORACLE = """
WITH toks AS (
  SELECT source, len(regexp_split_to_array(text, '\\s+')) AS n FROM documents)
SELECT source, CAST(LENGTH(BIN(n)) AS BIGINT) AS log2_bin,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(MIN(n) AS BIGINT) AS min_tokens,
       CAST(MAX(n) AS BIGINT) AS max_tokens
FROM toks GROUP BY source, log2_bin
"""


@query("q183_log_histogram", oracle=_LOGHIST_ORACLE)
def q183_log_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source document-length histogram on log2-spaced bins —
    the right shape for heavy-tailed length distributions where
    equi-width bins (q116) put everything in one bucket. The bin is
    floor(log2(n))+1 computed as LENGTH(BIN(n)) — pure integer bit
    arithmetic both engines share, dodging floating LOG2's
    last-ulp portability hazard entirely (same reasoning as the
    log-free idf in q130 and collision entropy in q141).

    Scale: map-side bin + a (sources x ~15 bins) agg; the histogram
    is the input to length-sharding (q104) and batching (q168)
    policies.
    """
    d = load_table(spark, sf_dir, "documents")
    n = F.size(F.split("text", r"\s+"))
    return (
        d.select("source", n.alias("n"))
        .groupBy("source", F.length(F.bin("n")).cast("bigint").alias("log2_bin"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.min("n").cast("bigint").alias("min_tokens"),
            F.max("n").cast("bigint").alias("max_tokens"),
        )
    )


# ---------------------------------------------------------------------------
# q184 — retention-policy sweep (TTL audit across tables)
# ---------------------------------------------------------------------------

_TTL_ORACLE = """
SELECT 'events' AS table_name,
       CAST((SELECT COUNT(*) FROM events
             WHERE ts < TIMESTAMP '2024-01-15 00:00:00') AS BIGINT) AS n_expired,
       CAST((SELECT COUNT(*) FROM events) AS BIGINT) AS n_rows
UNION ALL
SELECT 'orders',
       CAST((SELECT COUNT(*) FROM orders
             WHERE o_orderdate < TIMESTAMP '1995-01-01 00:00:00') AS BIGINT),
       CAST((SELECT COUNT(*) FROM orders) AS BIGINT)
UNION ALL
SELECT 'lineitem',
       CAST((SELECT COUNT(*) FROM lineitem
             WHERE l_shipdate < TIMESTAMP '1995-01-01 00:00:00') AS BIGINT),
       CAST((SELECT COUNT(*) FROM lineitem) AS BIGINT)
"""


@query("q184_retention_sweep", oracle=_TTL_ORACLE)
def q184_retention_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retention-policy audit: per time-partitioned table, how many
    rows are past their TTL cutoff — the nightly report that sizes
    the deletion job before it runs (the execution is a partition
    drop when the cutoff aligns with the layout, q18's Hive
    partitioning; an anti-join rewrite otherwise, q156).

    Scale: each count is a scan with the cutoff pushed into the
    parquet reader (min/max zone maps skip whole files, q138) — on a
    date-partitioned table it becomes pure partition pruning, no data
    read at all.
    """
    e = load_table(spark, sf_dir, "events")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")

    def row(name: str, df: DataFrame, col: str, cutoff: str) -> DataFrame:
        return df.agg(
            F.lit(name).alias("table_name"),
            F.sum((F.col(col) < F.lit(cutoff).cast("timestamp")).cast("bigint"))
            .cast("bigint")
            .alias("n_expired"),
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        )

    return (
        row("events", e, "ts", "2024-01-15 00:00:00")
        .unionByName(row("orders", o, "o_orderdate", "1995-01-01 00:00:00"))
        .unionByName(row("lineitem", li, "l_shipdate", "1995-01-01 00:00:00"))
    )


# ---------------------------------------------------------------------------
# q185 — cross-domain identity consistency (warehouse ↔ event stream)
# ---------------------------------------------------------------------------

_XDOM_ORACLE = """
WITH c AS (SELECT DISTINCT c_custkey AS id FROM customer),
e AS (SELECT DISTINCT user_id AS id FROM events)
SELECT 'both' AS cohort, CAST(COUNT(*) AS BIGINT) AS n
FROM c WHERE id IN (SELECT id FROM e)
UNION ALL
SELECT 'customer_only', CAST(COUNT(*) AS BIGINT)
FROM c WHERE id NOT IN (SELECT id FROM e)
UNION ALL
SELECT 'events_only', CAST(COUNT(*) AS BIGINT)
FROM e WHERE id NOT IN (SELECT id FROM c)
"""


@query("q185_identity_consistency", oracle=_XDOM_ORACLE)
def q185_identity_consistency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Identity reconciliation between the warehouse dimension and
    the event stream: ids present in both, customers who never emit
    events, and event emitters unknown to the dimension — the
    cross-system audit run before any join between the two worlds is
    trusted (events_only > 0 means the dim load lags the stream or
    ids don't share a namespace).

    Scale: distinct-key semi/anti joins — key-cardinality sized, the
    smaller key set broadcast. Same family as q154's referential
    check but across systems rather than within one schema.
    """
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("id")
    ).distinct()
    e = load_table(spark, sf_dir, "events").select(
        F.col("user_id").alias("id")
    ).distinct()

    def row(name: str, df: DataFrame) -> DataFrame:
        return df.agg(
            F.lit(name).alias("cohort"), F.count(F.lit(1)).cast("bigint").alias("n")
        )

    return (
        row("both", c.join(e, "id", "left_semi"))
        .unionByName(row("customer_only", c.join(e, "id", "left_anti")))
        .unionByName(row("events_only", e.join(c, "id", "left_anti")))
    )


# ---------------------------------------------------------------------------
# q186 — A/B readout on behavioral (session) metrics
# ---------------------------------------------------------------------------

_ABSESS_ORACLE = """
WITH g AS (
  SELECT user_id, ts, event_id,
         CASE WHEN EPOCH_US(ts) - EPOCH_US(LAG(ts) OVER w) > 1800000000
                   OR LAG(ts) OVER w IS NULL THEN 1 ELSE 0 END AS ns
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
s AS (SELECT user_id,
             SUM(ns) OVER (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS UNBOUNDED PRECEDING) AS sid
      FROM g),
per_user AS (
  SELECT user_id, COUNT(DISTINCT sid) AS n_sessions, COUNT(*) AS n_events
  FROM s GROUP BY user_id),
armed AS (
  SELECT INSTR('0123456789abcdef',
               SUBSTR(MD5('ab:' || CAST(user_id AS VARCHAR)), 1, 1)) % 2 AS arm,
         n_sessions, n_events
  FROM per_user)
SELECT arm, CAST(COUNT(*) AS BIGINT) AS n_users,
       CAST(SUM(n_sessions) AS BIGINT) AS total_sessions,
       CAST(SUM(n_events) AS BIGINT) AS total_events,
       CAST(FLOOR(1e6 * CAST(SUM(n_events) AS DOUBLE)
                  / CAST(SUM(n_sessions) AS DOUBLE) + 0.5) AS BIGINT)
         AS events_per_session_micro
FROM armed GROUP BY arm
"""


@query("q186_ab_session_metrics", oracle=_ABSESS_ORACLE)
def q186_ab_session_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Experiment readout on a BEHAVIORAL metric: the q165 hash-split
    arms evaluated on sessionized engagement (q20's 30-min gap
    sessions) — users, sessions, events, and events-per-session per
    arm. The composition every product experiment actually ships:
    value metrics (q165) and behavior metrics (this) from the same
    stable assignment function.

    Scale: sessionization's entity-key window and the per-user rollup
    share one exchange; the arm rollup is a 2-key agg. The assignment
    being a pure id function means both readouts join-free agree on
    who is in which arm.
    """
    e = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    gap = us - F.lag(us).over(w)
    ns = F.when(gap.isNull() | (gap > 1_800_000_000), 1).otherwise(0)
    ws = W.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    s = e.select("user_id", "ts", "event_id").withColumn("sid", F.sum(ns).over(ws))
    per_user = s.groupBy("user_id").agg(
        F.count_distinct("sid").alias("n_sessions"), F.count(F.lit(1)).alias("n_events")
    )
    arm = F.expr(
        "instr('0123456789abcdef', substr(md5(cast('ab:' || cast(user_id as string) as binary)), 1, 1)) % 2"
    )
    return (
        per_user.select(arm.alias("arm"), "n_sessions", "n_events")
        .groupBy("arm")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_users"),
            F.sum("n_sessions").cast("bigint").alias("total_sessions"),
            F.sum("n_events").cast("bigint").alias("total_events"),
            F.floor(
                F.lit(1e6)
                * F.sum("n_events").cast("double")
                / F.sum("n_sessions").cast("double")
                + F.lit(0.5)
            )
            .cast("bigint")
            .alias("events_per_session_micro"),
        )
    )


# ---------------------------------------------------------------------------
# q200 — Bloom-filter join pruning (probe-side pre-filter + exact join)
# ---------------------------------------------------------------------------

_BLOOM_ORACLE = """
SELECT o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
         AS total_cents
FROM orders
WHERE o_custkey IN (
  SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
)
GROUP BY o_orderpriority
"""


@query("q200_bloom_prune_join", oracle=_BLOOM_ORACLE)
def q200_bloom_prune_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-join with an explicit Bloom pre-filter (operators/bloom.py):
    the build side's keys (BUILDING-segment customers) become a
    broadcast bitmap tested with pure column expressions
    (xxhash64 + getbit) inside the probe scan's stage; the exact
    broadcast semi-join that follows kills false positives, so the
    result is identical to the plain semi-join the oracle computes.

    Scale: at 100 TB the probe scan drops non-candidate rows before
    any exchange — the pattern Spark's runtime bloom filter applies
    automatically for joins, made explicit so it can be sized, built
    once, reused across queries, and placed ahead of UDF stages the
    optimizer won't reach. No false negatives by construction: the
    bitmap's positions are computed by the same JVM xxhash64 the
    probe test uses (build_bloom collects bit positions, bounded by
    k·|keys|, never build-side rows)."""
    from kinesis_producer_spark.operators.bloom import bloom_semi_join

    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    hit = bloom_semi_join(o, c, "o_custkey", "c_custkey")
    cents = F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("bigint")
    return hit.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_orders"),
        F.sum(cents).cast("bigint").alias("total_cents"),
    )


# ---------------------------------------------------------------------------
# q201 — exact heavy hitters via per-partition threshold pruning
# ---------------------------------------------------------------------------

_HH_THRESHOLD = 200
_HH_PARTS = 32

_HH_ORACLE = f"""
WITH toks AS (
  SELECT UNNEST(regexp_split_to_array(LOWER(text), '\\s+')) AS tok
  FROM documents
)
SELECT tok, CAST(COUNT(*) AS BIGINT) AS cnt
FROM toks WHERE tok <> ''
GROUP BY tok HAVING COUNT(*) >= {_HH_THRESHOLD}
"""


@query("q201_heavy_hitters_pruned", oracle=_HH_ORACLE)
def q201_heavy_hitters_pruned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT corpus heavy hitters (tokens with count ≥ T) without
    shuffling the full vocabulary. Pass 1 counts tokens WITHIN each
    partition (mapInPandas, no shuffle) and keeps local candidates
    with local count ≥ ceil(T/P): by pigeonhole, any token with
    global count ≥ T must clear that bar in at least one of the P
    partitions — if all P stayed below ceil(T/P), the total would be
    ≤ P·(ceil(T/P)−1) < T. Pass 2 exact-counts ONLY the candidate
    union via a broadcast semi-join. The candidate set is a superset
    of the truth for ANY partitioning, so the output is exact and
    deterministic — the oracle is the plain SQL heavy-hitter query.

    Scale: a naive groupBy shuffles every distinct token (billions at
    100 TB, hash-partial aggregation states included); here the
    exchange carries only tokens that are locally frequent somewhere
    — for Zipfian text a few thousand — plus one broadcast of the
    candidate list. The local pass streams each partition through a
    dict counter; memory is bounded by per-partition vocabulary,
    which maxPartitionBytes already bounds."""
    import math

    d = load_table(spark, sf_dir, "documents")
    toks = (
        d.select(F.explode(F.split(F.lower("text"), r"\s+")).alias("tok"))
        .filter(F.col("tok") != "")
        .repartition(_HH_PARTS)
    )
    local_bar = math.ceil(_HH_THRESHOLD / _HH_PARTS)

    def local_candidates(batches):
        import pandas as pd

        counts: dict[str, int] = {}
        for pdf in batches:
            for tok, cnt in pdf["tok"].value_counts().items():
                counts[tok] = counts.get(tok, 0) + int(cnt)
        cand = [t for t, c in counts.items() if c >= local_bar]
        yield pd.DataFrame({"tok": cand})

    candidates = toks.mapInPandas(local_candidates, "tok string").distinct()
    return (
        toks.join(F.broadcast(candidates), "tok", "left_semi")
        .groupBy("tok")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
        .filter(F.col("cnt") >= _HH_THRESHOLD)
    )


# ---------------------------------------------------------------------------
# q211 — grouped heavy hitters (per-group pigeonhole pruning)
# ---------------------------------------------------------------------------


def grouped_hh_candidates(
    df: DataFrame,
    group_cols: list[str],
    item_col: str,
    threshold: int,
    n_parts: int = 32,
) -> DataFrame:
    """Candidate (group, item) pairs for exact per-group heavy hitters.

    Pigeonhole over P partitions, per composite key: any (group, item)
    with global count ≥ T must reach local count ≥ ceil(T/P) in at
    least one partition — otherwise the total is ≤ P·(ceil(T/P)−1)
    < T. The candidate set is therefore a SUPERSET of the truth for
    any partitioning, so the verify pass is exact.

    Memory bound (the adversarial case): the local counter holds at
    most one entry per distinct (group, item) in the partition, which
    ``maxPartitionBytes`` bounds; the EMITTED candidates are at most
    rows_in_partition / ceil(T/P) — an all-distinct partition (the
    non-Zipfian worst case) emits nothing once T > P, because every
    local count is 1 < ceil(T/P).
    """
    import math

    cols = list(group_cols) + [item_col]
    src = df.select(*cols).repartition(n_parts)
    bar = math.ceil(threshold / n_parts)

    def local_candidates(batches):
        import pandas as pd

        counts: dict[tuple, int] = {}
        for pdf in batches:
            sizes = pdf.groupby(cols, dropna=False, sort=False).size()
            for key, cnt in sizes.items():
                k = key if isinstance(key, tuple) else (key,)
                counts[k] = counts.get(k, 0) + int(cnt)
        cand = [k for k, c in counts.items() if c >= bar]
        yield pd.DataFrame(cand, columns=cols)

    return src.mapInPandas(local_candidates, src.schema).distinct()


def grouped_heavy_hitters(
    df: DataFrame,
    group_cols: list[str],
    item_col: str,
    threshold: int,
    n_parts: int = 32,
) -> DataFrame:
    """EXACT per-group heavy hitters: (group…, item, cnt) for every
    item whose count WITHIN its group reaches ``threshold`` — the
    100 TB telemetry shape (hitters per reading_type/day) — without
    shuffling the full per-group vocabulary.

    Same two-pass shape as the global q201: candidate pruning (one
    narrow pass), then exact counting of the broadcast candidate
    union only. The exchange carries only locally-frequent composite
    keys; everything else dies before the shuffle."""
    cols = list(group_cols) + [item_col]
    src = df.select(*cols)
    candidates = grouped_hh_candidates(df, group_cols, item_col, threshold, n_parts)
    return (
        src.join(F.broadcast(candidates), cols, "left_semi")
        .groupBy(*cols)
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
        .filter(F.col("cnt") >= threshold)
    )


_GHH_THRESHOLD = 50

_GHH_ORACLE = f"""
WITH toks AS (
  SELECT source, UNNEST(regexp_split_to_array(LOWER(text), '\\s+')) AS tok
  FROM documents
)
SELECT source, tok, CAST(COUNT(*) AS BIGINT) AS cnt
FROM toks WHERE tok <> ''
GROUP BY source, tok HAVING COUNT(*) >= {_GHH_THRESHOLD}
"""


@query("q211_grouped_heavy_hitters", oracle=_GHH_ORACLE)
def q211_grouped_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-SOURCE token heavy hitters (count ≥ T within the source),
    exact, via the grouped pigeonhole pattern — the per-domain
    vocabulary never shuffles, only locally-frequent (source, token)
    pairs plus one broadcast of the candidate list."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        "source", F.explode(F.split(F.lower("text"), r"\s+")).alias("tok")
    ).filter(F.col("tok") != "")
    return grouped_heavy_hitters(toks, ["source"], "tok", _GHH_THRESHOLD)


# ---------------------------------------------------------------------------
# q202 — compressed-blob text source (gzip/zlib column inflate)
# ---------------------------------------------------------------------------

_GUNZIP_ORACLE = """
SELECT doc_id,
       MD5(text) AS text_md5,
       CAST(LENGTH(text) AS INT) AS n_chars,
       CASE WHEN doc_id % 2 = 0 THEN 'gzip' ELSE 'zlib' END AS container
FROM documents
"""


@query("q202_gzip_text_source", oracle=_GUNZIP_ORACLE)
def q202_gzip_text_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compressed-column text source round-trip: every document's text
    is deflated into a per-record blob (gzip container on even
    doc_ids — with mtime pinned to 0 for determinism — zlib framing
    on odd), then re-inflated by ``sources.compressed.gunzip_text``
    (stdlib zlib, auto-detecting wbits=47, zip-bomb bounded). The
    oracle reads the ORIGINAL text, so the md5/length comparison
    proves byte-exact recovery through both container formats.

    This is the distributed re-expression of the reference's
    driver-side gunzip (reference ``decompression.py:14-21`` gunzips
    whole S3 objects on one host): per-record blobs inflate inside
    Arrow-batched executor stages, so 100 TB of compressed text never
    converges on a single machine."""
    from kinesis_producer_spark.sources.compressed import gunzip_text

    # spread before the Python deflate/inflate stages: a single parquet
    # file scans as one partition, serializing the codec onto one core
    d = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .repartition(spark.sparkContext.defaultParallelism)
    )

    def deflate(batches):
        import gzip
        import zlib as _z

        import pandas as pd

        for pdf in batches:
            rows = []
            for did, text in zip(pdf["doc_id"], pdf["text"]):
                raw = str(text).encode("utf-8")
                did = int(did)
                blob = (
                    gzip.compress(raw, mtime=0)
                    if did % 2 == 0
                    else _z.compress(raw)
                )
                rows.append({"doc_id": did, "content": blob})
            yield pd.DataFrame(rows, columns=["doc_id", "content"])

    blobs = d.mapInPandas(deflate, "doc_id long, content binary")
    out = gunzip_text(blobs)
    return out.select(
        "doc_id",
        F.md5(F.col("text").cast("binary")).alias("text_md5"),
        F.length("text").cast("int").alias("n_chars"),
        F.when(F.col("doc_id") % 2 == 0, "gzip").otherwise("zlib").alias("container"),
    )


# ---------------------------------------------------------------------------
# q203 — bucketed-table layout: the recurring join with zero shuffle
# ---------------------------------------------------------------------------

_BUCKETED_ORACLE = """
SELECT o.o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n_lines,
       CAST(SUM(CAST(FLOOR(l.l_extendedprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
         AS total_cents
FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
GROUP BY o.o_orderpriority
"""


@query("q203_bucketed_join", oracle=_BUCKETED_ORACLE)
def q203_bucketed_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact-fact join through hash-bucketed layout
    (operators/bucketed.py): orders and lineitem are first written
    ``bucketBy(orderkey)`` + ``sortBy`` into co-located tables, then
    joined — Spark plans a sort-merge over matching buckets with NO
    Exchange on either join side (asserted in tests/test_bucketed.py;
    the only exchange left in this query is the final groupBy's).

    Scale: this is the standing answer to the biggest recurring
    shuffle in any pipeline that joins the same fact tables daily —
    pay the layout write once, then every subsequent join on the
    bucket key moves zero bytes between executors. The bucketed write
    itself is one shuffle (bucketBy hashes rows to buckets), so it
    amortizes after the second query; bucket count (8 here, sized to
    the fixture) would be ~4000 at 100 TB so each bucket-file stays
    in the hundreds of MB."""
    import tempfile

    from kinesis_producer_spark.operators.bucketed import bucketed, write_bucketed

    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_extendedprice")
    base = tempfile.gettempdir()
    write_bucketed(o, "kps_b_orders", "o_orderkey", 8, path=f"{base}/kps_b_orders")
    write_bucketed(li, "kps_b_lineitem", "l_orderkey", 8, path=f"{base}/kps_b_lineitem")
    bo = bucketed(spark, "kps_b_orders")
    bl = bucketed(spark, "kps_b_lineitem")
    joined = bo.join(bl, bo["o_orderkey"] == bl["l_orderkey"])
    cents = F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5)).cast("bigint")
    return joined.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_lines"),
        F.sum(cents).cast("bigint").alias("total_cents"),
    )


# ---------------------------------------------------------------------------
# q207 — webdataset tar-shard packing, round-tripped through the source
# ---------------------------------------------------------------------------

_WDS_ORACLE = """
SELECT CAST(doc_id AS VARCHAR) || '.txt' AS member_name,
       MD5(text) AS text_md5,
       CAST(LENGTH(text) AS BIGINT) AS n_chars
FROM documents
"""


@query("q207_webdataset_roundtrip", oracle=_WDS_ORACLE)
def q207_webdataset_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-shard layout round trip: documents become
    ``{doc_id}.txt`` members packed into 16 webdataset-style tar
    shards (``pack_tar_shards`` — hash-assigned, sorted, metadata
    zeroed), then the SAME engine's tar source (``tar_members``)
    re-explodes the shards and the query reports each member's md5
    and length. The oracle reads the original documents, so the
    comparison proves byte-exact round trip through the pack/unpack
    pair — sink and source kept honest against each other.

    Scale: pack is one shuffle keyed by shard id; unpack streams one
    archive per task. This is the layout conversion step between a
    columnar lakehouse and the sequential-read shard files training
    loaders consume."""
    from kinesis_producer_spark.sources.tar import pack_tar_shards, tar_members

    d = load_table(spark, sf_dir, "documents").select(
        F.concat(F.col("doc_id").cast("string"), F.lit(".txt")).alias("key"),
        F.col("text").cast("binary").alias("content"),
    )
    shards = pack_tar_shards(d, key_col="key", content_col="content", n_shards=16)
    members = tar_members(
        shards.select(
            F.col("shard_id").cast("string").alias("path"),
            F.col("tar_bytes").alias("content"),
        ),
        content_col="content",
        archive_col="path",
    )
    return members.select(
        "member_name",
        F.md5("content").alias("text_md5"),
        F.col("size").cast("bigint").alias("n_chars"),
    )


# ---------------------------------------------------------------------------
# q208 — epoch-seeded deterministic training shuffle
# ---------------------------------------------------------------------------

_EPOCH_ORACLE = """
SELECT doc_id, epoch,
       ROW_NUMBER() OVER (
         PARTITION BY epoch
         ORDER BY MD5('ep:' || CAST(epoch AS VARCHAR) || ':'
                      || CAST(doc_id AS VARCHAR)), doc_id
       ) AS position
FROM documents, (SELECT UNNEST(range(3)) AS epoch)
"""


@query("q208_epoch_shuffle", oracle=_EPOCH_ORACLE)
def q208_epoch_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reproducible epoch shuffle — the training-loader primitive:
    each epoch orders the corpus by a content-stable hash of
    (epoch, doc_id), so the permutation is (a) different every epoch,
    (b) bit-identical across runs, engines, retries, and cluster
    sizes, and (c) resumable from any position without replaying the
    stream. rand()-based shuffles guarantee none of these (SURVEY
    q70 notes the same argument for splits).

    Scale: the ORDER BY inside the window is a range-partitioned
    sort per epoch — Spark's sort-based shuffle handles corpus-scale
    ordering; no driver involvement."""
    d = load_table(spark, sf_dir, "documents").select("doc_id")
    epochs = spark.range(3).select(F.col("id").cast("bigint").alias("epoch"))
    keyed = d.crossJoin(F.broadcast(epochs)).select(
        "doc_id",
        "epoch",
        F.md5(
            F.concat(
                F.lit("ep:"),
                F.col("epoch").cast("string"),
                F.lit(":"),
                F.col("doc_id").cast("string"),
            )
        ).alias("h"),
    )
    w = W.partitionBy("epoch").orderBy("h", "doc_id")
    return keyed.select(
        "doc_id", "epoch", F.row_number().over(w).cast("bigint").alias("position")
    )


# ---------------------------------------------------------------------------
# q214 — Z-order (Morton) clustering for multi-dimensional data skipping
# ---------------------------------------------------------------------------


def morton_z(x, y, bits: int = 8):
    """Morton/Z-order interleave of two non-negative ints (``bits`` bits
    each) as a pure column expression: bit i of x lands at 2i, bit i of
    y at 2i+1. JVM-side shifts/ands only — codegen-friendly, no UDF.

    This is the layout key behind multi-dimensional data skipping
    (Delta OPTIMIZE ZORDER BY, Hudi/Iceberg z-curves): sorting by z
    clusters rows that are close in BOTH dimensions into the same
    file, so a box predicate on (x, y) prunes most files by their
    min/max stats — a 1-D sort can only skip on its leading column.
    """
    z = F.lit(0).cast("bigint")
    for i in range(bits):
        z = (
            z
            + F.shiftleft(F.shiftright(x.cast("bigint"), i).bitwiseAND(1), 2 * i)
            + F.shiftleft(F.shiftright(y.cast("bigint"), i).bitwiseAND(1), 2 * i + 1)
        )
    return z


def _morton_sql(x: str, y: str, bits: int = 8) -> str:
    terms = []
    for i in range(bits):
        terms.append(f"((({x} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({y} >> {i}) & 1) << {2 * i + 1})")
    return " + ".join(terms)


_Z_TILE = 64  # 64 z-values = one 8x8 tile in (x, y) space


@query(
    "q214_zorder_locality",
    oracle=f"""
    WITH z AS (
      SELECT (user_id % 256) AS x,
             EXTRACT(day FROM ts) AS y,
             ({_morton_sql("(user_id % 256)", "EXTRACT(day FROM ts)")}) AS zval
      FROM events
    )
    SELECT CAST(zval // {_Z_TILE} AS BIGINT) AS tile,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(MIN(x) AS BIGINT) AS min_x, CAST(MAX(x) AS BIGINT) AS max_x,
           CAST(MIN(y) AS BIGINT) AS min_y, CAST(MAX(y) AS BIGINT) AS max_y
    FROM z GROUP BY 1
    """,
)
def q214_zorder_locality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order layout statistics: events keyed by (user bucket,
    day-of-month) get a Morton z-value; grouping by ``zval div 64``
    simulates 64-row-range files after an OPTIMIZE-ZORDER rewrite and
    reports each tile's min/max in BOTH dimensions. The payoff the
    numbers show: every tile's x-range and y-range are ≤ 8 wide (an
    8×8 tile), so file-level min/max stats prune a box predicate in
    either or both dimensions — the multi-dimensional data-skipping
    argument, measured rather than asserted (pinned by a locality
    test).

    Scale: the z-value is a codegen'd integer expression; the real
    deployment sorts the write by ``zval`` (repartitionByRange) so
    parquet row-groups inherit the tile bounds shown here. One
    groupBy exchange on the tile id."""
    e = load_table(spark, sf_dir, "events")
    x = F.pmod(F.col("user_id"), F.lit(256))
    y = F.dayofmonth("ts")
    z = e.select(
        x.alias("x"), y.alias("y"), morton_z(x, y).alias("zval")
    )
    return z.groupBy(
        F.expr(f"zval div {_Z_TILE}").cast("bigint").alias("tile")
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.min("x").cast("bigint").alias("min_x"),
        F.max("x").cast("bigint").alias("max_x"),
        F.min("y").cast("bigint").alias("min_y"),
        F.max("y").cast("bigint").alias("max_y"),
    )


# ---------------------------------------------------------------------------
# q218 — Count-Min sketch (mergeable frequency estimates, exact cross-engine)
# ---------------------------------------------------------------------------

_CMS_D = 4  # hash rows
_CMS_W = 256  # counters per row
# row-r cell of a token: byte r of md5(tok) → 0..255 (d=4 independent
# byte slices of one digest — same one-digest discipline as MinHash)
_CMS_CELL = (
    "(INSTR('0123456789abcdef', SUBSTR(MD5(tok), {p1}, 1)) - 1) * 16 + "
    "(INSTR('0123456789abcdef', SUBSTR(MD5(tok), {p2}, 1)) - 1)"
)


def _cms_cell_sql(r: int) -> str:
    return _CMS_CELL.format(p1=2 * r + 1, p2=2 * r + 2)


_CMS_ORACLE = f"""
WITH toks AS (
  SELECT UNNEST(regexp_split_to_array(LOWER(text), '\\s+')) AS tok
  FROM documents
), toks2 AS (SELECT tok FROM toks WHERE tok <> ''),
cells AS (
  SELECT r, cell, CAST(COUNT(*) AS BIGINT) AS counter
  FROM (
    {" UNION ALL ".join(f"SELECT {r} AS r, {_cms_cell_sql(r)} AS cell, tok FROM toks2" for r in range(_CMS_D))}
  ) GROUP BY r, cell
),
truth AS (
  SELECT tok, CAST(COUNT(*) AS BIGINT) AS true_cnt
  FROM toks2 GROUP BY tok HAVING COUNT(*) >= 100
)
SELECT t.tok, t.true_cnt,
       CAST(MIN(c.counter) AS BIGINT) AS cms_estimate
FROM truth t
JOIN cells c
  ON (c.r = 0 AND c.cell = {_cms_cell_sql(0).replace('tok', 't.tok')})
  OR (c.r = 1 AND c.cell = {_cms_cell_sql(1).replace('tok', 't.tok')})
  OR (c.r = 2 AND c.cell = {_cms_cell_sql(2).replace('tok', 't.tok')})
  OR (c.r = 3 AND c.cell = {_cms_cell_sql(3).replace('tok', 't.tok')})
GROUP BY t.tok, t.true_cnt
"""


def countmin_cells(tokens: DataFrame, tok_col: str = "tok") -> DataFrame:
    """Count-Min sketch as a (row, cell, counter) frame: d=4 hash rows
    of w=256 counters, cells derived from byte slices of one md5 per
    token. The sketch is MERGEABLE (counters add), so partial sketches
    combine across partitions/days/streams with a plain groupBy sum —
    the property that makes CMS the frequency sketch of choice at
    100 TB: fixed d×w memory regardless of vocabulary size, and
    estimates that only ever overestimate (min over rows bounds the
    collision error)."""
    tok = F.col(tok_col)
    rows = []
    for r in range(_CMS_D):
        cell = (
            F.conv(F.substring(F.md5(tok), 2 * r + 1, 2), 16, 10).cast("int")
        )
        rows.append(
            tokens.select(F.lit(r).alias("r"), cell.alias("cell"))
        )
    allrows = rows[0]
    for fr in rows[1:]:
        allrows = allrows.unionByName(fr)
    return allrows.groupBy("r", "cell").agg(
        F.count(F.lit(1)).cast("bigint").alias("counter")
    )


@query("q218_countmin_sketch", oracle=_CMS_ORACLE)
def q218_countmin_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min sketch frequency estimates, exact cross-engine: build
    the d×w counter grid over the token stream, then read back the
    point estimate (min over the d rows' cells) for every token whose
    TRUE count ≥ 100 and report both numbers. The oracle recomputes
    the same grid relationally, so the query pins the hash family,
    the cell arithmetic, and the min-read — and the result exhibits
    the CMS contract (estimate ≥ truth) which the test asserts.

    Scale: the sketch build is a map-side-combinable groupBy on
    (r, cell) — at most d×w = 1024 groups regardless of corpus size;
    the probe side broadcasts the tiny counter grid back. Nothing
    vocabulary-sized ever shuffles (contrast q201, which needs exact
    answers and shuffles pruned candidates)."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        F.explode(F.split(F.lower("text"), r"\s+")).alias("tok")
    ).filter(F.col("tok") != "")
    cells = countmin_cells(toks)

    truth = (
        toks.groupBy("tok")
        .agg(F.count(F.lit(1)).cast("bigint").alias("true_cnt"))
        .filter(F.col("true_cnt") >= 100)
    )
    probe = truth
    for r in range(_CMS_D):
        cell = F.conv(F.substring(F.md5(F.col("tok")), 2 * r + 1, 2), 16, 10).cast(
            "int"
        )
        keep = ["tok", "true_cnt"] + [f"c{i}" for i in range(r)]
        probe = probe.join(
            F.broadcast(cells.filter(F.col("r") == r).select("cell", "counter")),
            cell == F.col("cell"),
        ).select(*keep, F.col("counter").alias(f"c{r}"))
    est = probe.select(
        "tok",
        "true_cnt",
        F.least(*[F.col(f"c{r}") for r in range(_CMS_D)])
        .cast("bigint")
        .alias("cms_estimate"),
    )
    return est


# ---- HyperLogLog registers (q222) --------------------------------------
#
# q145's KMV sketch is the order-statistics distinct estimator; HLL is
# the industry-standard REGISTER sketch (Flajolet et al. 2007) and the
# one production systems merge across days/sources. Engine-native HLLs
# (approx_count_distinct, DuckDB's approx_*) use private register
# layouts that can never cross-check — so this operator builds the
# registers themselves from md5, deterministically and identically in
# both engines: bucket = first 8 bits of the hash, rho = 1 + leading
# zeros of the remaining 120 bits. The register table (bucket,
# max_rho) IS the sketch: exact integers, hash-comparable, mergeable
# by elementwise max. `hll_estimate` turns a register table into the
# bias-corrected cardinality estimate (driver-side float math on 256
# ints — deliberately OUTSIDE the oracle-checked query).

_HLL_M = 256  # 2^8 buckets

# 1 + leading zero BITS of the first nonzero hex digit
_HLL_DIGIT_CASE = (
    "CASE WHEN nv >= 8 THEN 0 WHEN nv >= 4 THEN 1 WHEN nv >= 2 THEN 2 ELSE 3 END"
)

_HLL_ORACLE = """
WITH h AS (
  SELECT MD5('p:' || CAST(l_partkey AS VARCHAR)) AS hx FROM lineitem
), parts AS (
  SELECT (INSTR('0123456789abcdef', SUBSTR(hx, 1, 1)) - 1) * 16
         + (INSTR('0123456789abcdef', SUBSTR(hx, 2, 1)) - 1) AS bucket,
         SUBSTR(hx, 3, 30) AS rest
  FROM h
), z AS (
  SELECT bucket, rest,
         LENGTH(regexp_extract(rest, '^(0*)', 1)) AS zeros
  FROM parts
), rho AS (
  SELECT bucket,
         CASE WHEN zeros >= 30 THEN 121
              ELSE 4 * zeros
                   + (CASE WHEN nv >= 8 THEN 0 WHEN nv >= 4 THEN 1
                           WHEN nv >= 2 THEN 2 ELSE 3 END) + 1
         END AS r
  FROM (SELECT bucket, zeros,
               INSTR('0123456789abcdef', SUBSTR(rest, zeros + 1, 1)) - 1 AS nv
        FROM z)
)
SELECT CAST(bucket AS INT) AS bucket,
       CAST(MAX(r) AS INT) AS max_rho,
       COUNT(*) AS n_rows
FROM rho GROUP BY bucket
"""


def hll_bucket_rho(df: DataFrame, key: Column) -> DataFrame:
    """(bucket, r) rows for the HLL register build — bucket = first 8
    md5 bits of the key, r = 1 + leading zeros of the remaining 120.
    Pure stream-safe column expressions: the caller aggregates with
    ``groupBy("bucket").max("r")`` in batch OR streaming (max is an
    incrementally-maintainable aggregate, so a streaming grid equals
    the batch grid over the same corpus — pinned in tests)."""
    h = df.select(F.md5(key.cast("binary")).alias("hx"))
    parts = h.selectExpr(
        "cast(conv(substring(hx, 1, 2), 16, 10) as int) as bucket",
        "substring(hx, 3, 30) as rest",
    )
    z = parts.selectExpr(
        "bucket", "rest", "length(regexp_extract(rest, '^(0*)', 1)) as zeros"
    )
    return z.selectExpr(
        "bucket",
        "zeros",
        "cast(conv(substring(rest, zeros + 1, 1), 16, 10) as int) as nv",
    ).selectExpr(
        "bucket",
        f"CASE WHEN zeros >= 30 THEN 121 ELSE 4 * zeros + ({_HLL_DIGIT_CASE}) + 1 END"
        " as r",
    )


@query("q222_hll_registers", oracle=_HLL_ORACLE)
def q222_hll_registers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog register construction over lineitem part keys —
    deterministic md5 registers, identical in Spark and DuckDB (see
    module comment). One row per occupied bucket: (bucket, max_rho,
    n_rows).

    Scale: pure column expressions into a 256-group aggregate —
    map-side combine reduces every partition to ≤256 rows before the
    exchange, so shuffle bytes are O(m · partitions) regardless of row
    count; the register table is mergeable by elementwise max, the
    standard cross-day/cross-source union. 100 TB shape: identical.
    """
    li = load_table(spark, sf_dir, "lineitem")
    rho = hll_bucket_rho(
        li, F.concat(F.lit("p:"), F.col("l_partkey").cast("string"))
    )
    return rho.groupBy("bucket").agg(
        F.max("r").cast("int").alias("max_rho"),
        F.count(F.lit(1)).alias("n_rows"),
    )


def hll_estimate(registers: dict[int, int], m: int = _HLL_M) -> float:
    """Bias-corrected HLL cardinality estimate from a register table
    (missing buckets count as register value 0), per Flajolet et al.:
    E = alpha_m * m^2 / sum(2^-M_j), with the small-range linear-
    counting correction when E <= 2.5m and empty buckets exist."""
    import math

    alpha = 0.7213 / (1 + 1.079 / m)
    s = 0.0
    for j in range(m):
        s += 2.0 ** -registers.get(j, 0)
    e = alpha * m * m / s
    zeros = sum(1 for j in range(m) if registers.get(j, 0) == 0)
    if e <= 2.5 * m and zeros:
        return m * math.log(m / zeros)
    return e


# ---- KMV set operations (q224) -----------------------------------------
#
# q145 estimates per-segment distinct counts; the reason production
# systems keep the SKETCHES is set algebra across segments: |A ∪ B|
# from the merged sketch, |A ∩ B| from the sketch-overlap ratio
# (Beyer et al., "On synopses for distinct-value estimation under
# multiset operations", SIGMOD'07) — without re-scanning either
# segment. KMV set ops stay exactly reproducible cross-engine: every
# intermediate is a set of md5 hex strings + integer order
# statistics, so even the ESTIMATES are oracle-checked (the 48-bit
# fraction trick from q145).

_KSO_H48 = " + ".join(
    f"CAST(INSTR('0123456789abcdef', SUBSTR(kth, {k}, 1)) - 1 AS BIGINT)"
    f" * {16 ** (12 - k)}"
    for k in range(1, 13)
)

_KSO_ORACLE = f"""
WITH d AS (SELECT DISTINCT event_type AS t, user_id AS u,
                  MD5('u:' || CAST(user_id AS VARCHAR)) AS h
           FROM events),
sk AS (SELECT t, list_slice(list_sort(list(h)), 1, {_KMV_K}) AS ks FROM d GROUP BY t),
ex AS (SELECT a.t AS type_a, b.t AS type_b,
              CAST(COUNT(*) AS BIGINT) AS exact_intersect
       FROM d a JOIN d b ON a.u = b.u AND a.t < b.t GROUP BY 1, 2),
card AS (SELECT t, CAST(COUNT(*) AS BIGINT) AS n FROM d GROUP BY t),
pairs AS (
  SELECT a.t AS type_a, b.t AS type_b,
         list_slice(list_sort(list_distinct(list_concat(a.ks, b.ks))),
                    1, {_KMV_K}) AS mk,
         len(list_intersect(a.ks, b.ks)) AS raw_overlap,
         a.ks AS ks_a, b.ks AS ks_b
  FROM sk a JOIN sk b ON a.t < b.t
),
est AS (
  SELECT type_a, type_b,
         len(mk) AS n_mk,
         mk[{_KMV_K}] AS kth,
         CAST(len(list_intersect(list_intersect(ks_a, ks_b), mk)) AS BIGINT)
           AS n_overlap
  FROM pairs
),
u AS (
  SELECT type_a, type_b, n_overlap, n_mk,
         CASE WHEN n_mk >= {_KMV_K}
              THEN CAST(FLOOR(CAST({(_KMV_K - 1) * 281474976710656} AS DOUBLE)
                         / CAST({_KSO_H48} AS DOUBLE) + 0.5) AS BIGINT)
              ELSE CAST(n_mk AS BIGINT) END AS kmv_union_est
  FROM est
)
SELECT u.type_a, u.type_b,
       ca.n + cb.n - ex.exact_intersect AS exact_union,
       ex.exact_intersect,
       u.kmv_union_est,
       CASE WHEN u.n_mk >= {_KMV_K}
            THEN CAST(FLOOR(CAST(u.n_overlap AS DOUBLE) * u.kmv_union_est
                            / {_KMV_K} + 0.5) AS BIGINT)
            ELSE u.n_overlap END AS kmv_intersect_est
FROM u
JOIN ex ON ex.type_a = u.type_a AND ex.type_b = u.type_b
JOIN card ca ON ca.t = u.type_a
JOIN card cb ON cb.t = u.type_b
"""


@query("q224_kmv_set_ops", oracle=_KSO_ORACLE)
def q224_kmv_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct-user union/intersection across event-type segments from
    per-segment KMV sketches — exact counts alongside so the estimate
    error is visible in the result (q145's convention).

    Scale: per-segment sketches build with the q145 two-level partial
    aggregation (k rows per partition per segment cross the exchange,
    never raw users); set algebra then runs on |segments|² sketch
    rows — at 100 TB the segment-overlap matrix costs k·|segments|²
    string comparisons, with NO second pass over the data. The exact
    counts here exist only as the built-in error report; a production
    run drops them and touches the corpus once.
    """
    e = load_table(spark, sf_dir, "events")
    d = e.select(
        F.col("event_type").alias("t"),
        F.col("user_id").alias("u"),
        F.md5(F.concat(F.lit("u:"), F.col("user_id").cast("string")).cast("binary")).alias("h"),
    ).distinct()
    sk = kmv_partial_sketch(d, "t")
    card = d.groupBy("t").agg(F.count(F.lit(1)).alias("n"))
    ex = (
        d.alias("a")
        .join(d.alias("b"), (F.col("a.u") == F.col("b.u")) & (F.col("a.t") < F.col("b.t")))
        .groupBy(F.col("a.t").alias("type_a"), F.col("b.t").alias("type_b"))
        .agg(F.count(F.lit(1)).alias("exact_intersect"))
    )
    a, b = sk.alias("sa"), sk.alias("sb")
    pairs = (
        a.join(b, F.col("sa.t") < F.col("sb.t"))
        .select(
            F.col("sa.t").alias("type_a"),
            F.col("sb.t").alias("type_b"),
            F.slice(
                F.array_sort(F.array_distinct(F.concat(F.col("sa.ks"), F.col("sb.ks")))),
                1,
                _KMV_K,
            ).alias("mk"),
            F.col("sa.ks").alias("ks_a"),
            F.col("sb.ks").alias("ks_b"),
        )
        .select(
            "type_a",
            "type_b",
            F.size("mk").alias("n_mk"),
            # try_element_at: an UNSATURATED merged sketch (< k combined
            # distinct hashes — tiny fixtures, sparse segments) has no
            # kth element; ANSI element_at would kill the task there
            # (found in round-5 review, confirmed on sf0.001)
            F.try_element_at(F.col("mk"), F.lit(_KMV_K)).alias("kth"),
            F.size(
                F.array_intersect(F.array_intersect("ks_a", "ks_b"), F.col("mk"))
            )
            .cast("bigint")
            .alias("n_overlap"),
        )
    )
    v48 = F.conv(F.substring("kth", 1, 12), 16, 10).cast("bigint")
    saturated = F.col("n_mk") >= _KMV_K
    u = pairs.select(
        "type_a",
        "type_b",
        "n_overlap",
        "n_mk",
        # unsaturated sketches are EXACT sets: the merged sketch IS the
        # union and the overlap IS the intersection
        F.when(
            saturated,
            F.floor(
                F.lit(float((_KMV_K - 1) * 281474976710656)) / v48.cast("double")
                + F.lit(0.5)
            ).cast("bigint"),
        )
        .otherwise(F.col("n_mk").cast("bigint"))
        .alias("kmv_union_est"),
    )
    return (
        u.join(ex, ["type_a", "type_b"])
        .join(card.select(F.col("t").alias("type_a"), F.col("n").alias("na")), "type_a")
        .join(card.select(F.col("t").alias("type_b"), F.col("n").alias("nb")), "type_b")
        .select(
            "type_a",
            "type_b",
            (F.col("na") + F.col("nb") - F.col("exact_intersect")).alias("exact_union"),
            "exact_intersect",
            "kmv_union_est",
            F.when(
                F.col("n_mk") >= _KMV_K,
                F.floor(
                    F.col("n_overlap").cast("double")
                    * F.col("kmv_union_est")
                    / F.lit(float(_KMV_K))
                    + F.lit(0.5)
                ).cast("bigint"),
            )
            .otherwise(F.col("n_overlap"))
            .alias("kmv_intersect_est"),
        )
    )


# ---- mergeable quantile summary (q225) ---------------------------------
#
# Completes the mergeable-summary family (CMS counts, HLL/KMV
# distincts) with QUANTILES: a deterministic log-scale histogram
# keyed by (digit count, two leading digits) of integer cents — pure
# integer/string arithmetic, so unlike t-digest/GK (order-dependent)
# or float log-binning (last-ulp engine drift), the summary and every
# estimate read back hash-identically in Spark and DuckDB. Bin width
# is ≤ 10% of the value (prefix 10..99), so any quantile estimate
# (the containing bin's lower bound) is within one bin width below
# the true value. Counters ADD, so summaries merge across
# partitions/days/streams like the other sketches.

_Q225_QS = (250_000, 500_000, 750_000, 900_000, 990_000)  # micro-quantiles

_Q225_ORACLE = f"""
WITH c AS (
  SELECT CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT) AS cents FROM lineitem
), s AS (
  SELECT cents, CAST(cents AS VARCHAR) AS st FROM c
), hist AS (
  SELECT LENGTH(st) AS d, CAST(SUBSTR(st, 1, 2) AS BIGINT) AS p,
         COUNT(*) AS cnt
  FROM s GROUP BY 1, 2
), cum AS (
  SELECT d, p, cnt,
         SUM(cnt) OVER (ORDER BY d, p
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cs,
         CASE WHEN d <= 2 THEN p
              ELSE CAST(SUBSTR(CAST(p AS VARCHAR), 1, 2) || REPEAT('0', d - 2) AS BIGINT)
         END AS lb
  FROM hist
), n AS (SELECT COUNT(*) AS total FROM c),
qs AS (SELECT UNNEST(ARRAY{list(_Q225_QS)}) AS q_micro),
ranks AS (
  SELECT q_micro, CAST(CEIL(q_micro * total / 1000000.0) AS BIGINT) AS r
  FROM qs, n
), est AS (
  SELECT r.q_micro, MIN(c.d * 100 + c.p) AS binkey
  FROM ranks r JOIN cum c ON c.cs >= r.r
  GROUP BY r.q_micro
), vcum AS (
  -- convention-free DISCRETE exact: min value whose cumulative count
  -- reaches the rank (interpolated percentiles at 0.9/0.99 are not
  -- binary-exact fractions and drift a ulp between engines)
  SELECT cents,
         SUM(cnt) OVER (ORDER BY cents
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cs
  FROM (SELECT cents, COUNT(*) AS cnt FROM c GROUP BY cents)
), exact AS (
  SELECT r.q_micro, MIN(v.cents) AS exact_cents
  FROM ranks r JOIN vcum v ON v.cs >= r.r
  GROUP BY r.q_micro
)
SELECT e.q_micro,
       (SELECT lb FROM cum WHERE d * 100 + p = e.binkey) AS est_cents,
       x.exact_cents
FROM est e JOIN exact x ON x.q_micro = e.q_micro
"""


def logbin_histogram(vals: DataFrame, cents_col: str = "cents") -> DataFrame:
    """(d, p, cnt) log-scale histogram rows over positive integer
    values — d = digit count, p = two leading digits. Mergeable by
    summing cnt; usable as a plain streaming aggregation."""
    s = vals.select(F.col(cents_col).cast("string").alias("st"))
    return (
        s.select(
            F.length("st").alias("d"),
            F.substring("st", 1, 2).cast("bigint").alias("p"),
        )
        .groupBy("d", "p")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


@query("q225_logbin_quantiles", oracle=_Q225_ORACLE)
def q225_logbin_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantiles of lineitem prices read from the mergeable log-bin
    histogram, with the exact same-rank discrete percentile alongside
    so the ≤10% bin-width error is visible in the result.

    Scale: the histogram is a ≤|bins|-group map-side-combinable
    aggregate (a few hundred groups for any money-like domain); the
    read-back runs entirely on the tiny histogram — cumulative window
    over |bins| rows, never the data. The EXACT column is the built-in
    error report only: its distinct-value cumulative window is the
    corpus-sized sort the sketch exists to avoid, and a 100 TB run
    drops it — quantiles then cost one histogram scan + O(|bins|)
    work, the continuous-monitoring shape (latency dashboards, SLA
    burn) where re-sorting the corpus per refresh is impossible.
    """
    from pyspark.sql import Window as W

    li = load_table(spark, sf_dir, "lineitem")
    cents = li.select(
        F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5))
        .cast("bigint")
        .alias("cents")
    )
    hist = logbin_histogram(cents)
    cum = hist.withColumn(
        "cs",
        F.sum("cnt").over(
            W.orderBy("d", "p").rowsBetween(W.unboundedPreceding, 0)
        ),
    ).withColumn(
        "lb",
        F.when(F.col("d") <= 2, F.col("p")).otherwise(
            F.concat(
                F.col("p").cast("string"), F.expr("repeat('0', d - 2)")
            ).cast("bigint")
        ),
    )
    total = cents.count()  # one scalar — the only data-sized action
    ranks = spark.createDataFrame(
        [(q, -(-q * total // 1_000_000)) for q in _Q225_QS], "q_micro long, r long"
    )
    est = (
        ranks.join(cum, F.col("cs") >= F.col("r"))
        .groupBy("q_micro")
        .agg(F.min(F.col("d") * 100 + F.col("p")).alias("binkey"))
        .join(
            cum.select((F.col("d") * 100 + F.col("p")).alias("binkey"), "lb"),
            "binkey",
        )
        .select("q_micro", F.col("lb").alias("est_cents"))
    )
    # convention-free DISCRETE exact value at the same rank — the
    # interpolated (quantile_cont) form is not a binary-exact fraction
    # at 0.9/0.99 and drifts a ulp between engines
    vcum = (
        cents.groupBy("cents")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .withColumn(
            "cs",
            F.sum("cnt").over(
                W.orderBy("cents").rowsBetween(W.unboundedPreceding, 0)
            ),
        )
    )
    exact = (
        ranks.join(vcum, F.col("cs") >= F.col("r"))
        .groupBy("q_micro")
        .agg(F.min("cents").alias("exact_cents"))
    )
    return est.join(exact, "q_micro")
