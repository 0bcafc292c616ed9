"""Deduplication operators for training-data pipelines.

Five dedup families over a text corpus, each designed for 100 TB:

- **exact**: hash-groupBy on a content digest — one shuffle on the
  digest, map-side combine; the canonical representative is the min id.
- **MinHash + LSH**: per-row shingle→signature (zero shuffle — the
  signature is a pure column expression), band→bucket, candidate pairs
  from a self-join on bucket only (never all-pairs), then exact-Jaccard
  verification of candidates.
- **SimHash**: per-row 16-bit signature via per-bit majority vote over
  token hashes; collisions = near-dup buckets.
- **n-gram Jaccard**: exact set similarity, for verification or small
  blocked domains.
- **embedding cosine**: see operators/similarity.py.

Hashing is md5 (identical everywhere) and all scores are quantized to
integer micro-units with portable ``floor(x·10⁶+0.5)`` so results are
engine-reproducible (same rationale as functions.dsum).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

HEX = "0123456789abcdef"


def words(col: Column | str, pattern: str = r"\s+") -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.split(c, pattern)


def positional_shingles(col: Column | str, n: int = 2) -> Column:
    """Word n-grams of a text column IN POSITION ORDER: element i of
    the result is the gram covering tokens [i, i+n) (0-based). Pure
    column expression — no explode, no shuffle. Grams are built by
    zipping the word array with its own shifted slices; the word array
    only ever appears as a direct higher-order-function argument, never
    inside a lambda body (an ``element_at(w, i)`` inside the lambda
    would re-evaluate the split per element — O(words²) regex work).
    """
    w = words(col)
    if n == 1:
        return w
    grams = w
    for j in range(1, n):
        shifted = F.slice(w, j + 1, F.greatest(F.size(w) - j, F.lit(0)))
        # zip_with pads the shorter side with null; concat_ws skips
        # nulls, so the tail produces partial grams — sliced off below.
        grams = F.zip_with(grams, shifted, lambda a, b: F.concat_ws(" ", a, b))
    return F.slice(grams, 1, F.greatest(F.size(w) - (n - 1), F.lit(0)))


def shingles(col: Column | str, n: int = 2) -> Column:
    """Distinct word n-grams (default bigrams) of a text column —
    ``positional_shingles`` with position identity dropped (the set
    form the MinHash/Jaccard family wants)."""
    return F.array_distinct(positional_shingles(col, n))


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Groups of byte-identical content: (digest, representative, copies)."""
    return (
        df.select(F.md5(F.col(text_col).cast("binary")).alias("digest"), F.col(id_col))
        .groupBy("digest")
        .agg(F.min(id_col).alias("rep_id"), F.count(F.lit(1)).alias("n_copies"))
    )


def _marked_positions(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int,
    min_count: int,
    keep_first: bool = False,
) -> DataFrame:
    """(id, pos) for every token position whose n-gram starting there
    occurs >= min_count times in the corpus (all occurrences counted,
    including repeats inside one document).

    ``keep_first=True`` exempts each gram's CANONICAL occurrence — the
    lexicographically smallest (id, pos) — so one copy of every
    duplicated window survives the cut (the keep-one dedup policy).
    The canonical pick is min(struct(id, pos)) inside the same
    map-side-combinable aggregate as the count — deliberately NOT a
    row_number window per digest, which would hand a hot gram's
    million occurrences to one reducer.

    ``fan_out`` before the explode: the gram stage amplifies each doc
    ~|tokens|× and feeds a map-side hash agg, so its per-task memory
    is set by DOCS PER SCAN TASK, not bytes — a byte-small corpus
    file arrives as one split and would concentrate the whole gram
    set in one task (measured: per-task peak grew ~7x across the
    sf0.1→sf1.0 soak decade before this, flat after)."""
    from kinesis_producer_spark.tables import fan_out

    g = fan_out(df).select(
        F.col(id_col),
        F.posexplode(F.transform(positional_shingles(text_col, n), F.md5)).alias(
            "pos", "digest"
        ),
    )
    agg = g.groupBy("digest").agg(
        F.count(F.lit(1)).alias("_c"),
        F.min(F.struct(F.col(id_col), F.col("pos"))).alias("_canon"),
    )
    dup = agg.filter(F.col("_c") >= min_count)
    marked = g.join(dup, "digest")
    if keep_first:
        marked = marked.filter(
            ~(
                (F.col(id_col) == F.col(f"_canon.{id_col}"))
                & (F.col("pos") == F.col("_canon.pos"))
            )
        )
    return marked.select(id_col, "pos")


def exact_substring_spans(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 5,
    min_count: int = 2,
    keep_first: bool = False,
) -> DataFrame:
    """Span-level exact substring dedup: (id, start_token, end_token,
    span_tokens) for every maximal passage whose EVERY n-token window
    occurs >= min_count times in the corpus — the
    deduplicate-text-datasets / ExactSubstr semantics ("Deduplicating
    Training Data Makes Language Models Better", Lee et al. 2021) at
    token granularity: q99 reports THAT passages repeat; this emits
    WHERE TO CUT. ``end_token`` is exclusive; every span is >= n
    tokens by construction.

    Default policy: spans cover ALL duplicated occurrences.
    ``keep_first=True`` applies the keep-one policy — each gram's
    canonical (lexicographically first) occurrence is exempt from the
    cut, so exactly one copy of every duplicated window survives.

    Scale shape (never all-pairs, no suffix array): grams md5-digest
    to fixed-width keys before leaving the mapper; the >= min_count
    survivor set comes from a map-side-combining count; marking is one
    digest-keyed hash join, O(|grams|) shuffle; the run fold is a
    per-document window over MARKED positions only (pos - row_number
    constant within a consecutive run), bounded by document length —
    the same per-doc discipline as q189's longest-run fold.
    """
    marked = _marked_positions(df, id_col, text_col, n, min_count, keep_first)
    return _spans_from_marked(marked, id_col, n)


def _spans_from_marked(marked: DataFrame, id_col: str, n: int) -> DataFrame:
    """Fold marked gram positions into maximal (start, end) token spans
    — per-document window over marked positions only (pos − row_number
    is constant within a consecutive run)."""
    from pyspark.sql import Window as W

    w = W.partitionBy(id_col).orderBy("pos")
    runs = marked.withColumn("_grp", F.col("pos") - F.row_number().over(w))
    return (
        runs.groupBy(id_col, "_grp")
        .agg(
            F.min("pos").cast("bigint").alias("start_token"),
            (F.max("pos") + n).cast("bigint").alias("end_token"),
        )
        .withColumn("span_tokens", (F.col("end_token") - F.col("start_token")))
        .drop("_grp")
    )


def contamination_spans(
    train: DataFrame,
    ref: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    ref_text_col: str = "text",
    n: int = 5,
) -> DataFrame:
    """Span-level decontamination against a reference corpus: (id,
    start_token, end_token, span_tokens) for every maximal passage in
    ``train`` whose EVERY n-token window also occurs in ``ref`` — the
    benchmark-decontamination cut list (q80 flags WHICH documents leak
    an eval set; this says WHERE to cut them). Same run-fold contract
    as ``exact_substring_spans``: end exclusive, spans >= n tokens.

    Scale: the reference side reduces to DISTINCT gram digests (set
    semantics — ref-internal repetition is irrelevant), usually orders
    of magnitude smaller than the train gram stream; the mark is one
    digest-keyed join that AQE broadcasts when the eval set fits, and
    degrades to a shuffle join when it does not. Never all-pairs.
    """
    from kinesis_producer_spark.tables import fan_out

    g = fan_out(train).select(
        F.col(id_col),
        F.posexplode(F.transform(positional_shingles(text_col, n), F.md5)).alias(
            "pos", "digest"
        ),
    )
    ref_digests = (
        fan_out(ref)
        .select(F.explode(F.transform(shingles(ref_text_col, n), F.md5)).alias("digest"))
        .distinct()
    )
    marked = g.join(ref_digests, "digest").select(id_col, "pos")
    return _spans_from_marked(marked, id_col, n)


def substring_dedup_apply(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 5,
    min_count: int = 2,
    keep_first: bool = False,
) -> DataFrame:
    """Apply ``exact_substring_spans`` removals: drop every token
    covered by a duplicated n-gram window and re-join the survivors.
    ``keep_first=True`` applies the keep-one policy (see
    ``exact_substring_spans``) so canonical copies survive the cut.
    Returns (id, n_tokens, kept_tokens, removed_tokens, cleaned_md5)
    — the cleaned text is carried as its md5 so the output stays
    narrow at any document size (swap the select to emit the string
    itself when materializing a cleaned corpus).

    Scale: covered positions explode n rows per marked gram (bounded
    by n·|marked|), distinct + anti-join are digest/key-partitioned,
    and the ordered re-join is an in-memory array_sort per document —
    no window over the corpus, no driver collect.
    """
    marked = _marked_positions(df, id_col, text_col, n, min_count, keep_first)
    covered = marked.select(
        id_col,
        F.explode(F.sequence(F.col("pos"), F.col("pos") + (n - 1))).alias("tpos"),
    ).distinct()
    from kinesis_producer_spark.tables import fan_out

    toks = fan_out(df).select(
        F.col(id_col), F.posexplode(words(text_col)).alias("tpos", "tok")
    )
    kept = toks.join(covered, [id_col, "tpos"], "left_anti")
    cleaned = kept.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("_kept"),
        F.md5(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("tpos", "tok"))),
                    lambda s: s["tok"],
                ),
                " ",
            )
        ).alias("_md5"),
    )
    base = df.select(
        F.col(id_col), F.size(words(text_col)).cast("bigint").alias("n_tokens")
    )
    return base.join(cleaned, id_col, "left").select(
        id_col,
        "n_tokens",
        F.coalesce(F.col("_kept"), F.lit(0)).cast("bigint").alias("kept_tokens"),
        (F.col("n_tokens") - F.coalesce(F.col("_kept"), F.lit(0)))
        .cast("bigint")
        .alias("removed_tokens"),
        F.coalesce(F.col("_md5"), F.md5(F.lit(""))).alias("cleaned_md5"),
    )


def minhash_signature(df: DataFrame, shingle_col: Column, k: int = 8) -> Column:
    """k min-hashes as an array column — per-row, shuffle-free, ONE
    md5 per shingle.

    minhash_i = lexicographic MIN over shingles of the 64-bit hex
    window ``substr(md5(shingle), 1+2i, 16)`` — the rotation family
    from one-permutation hashing (Li et al., NIPS'12): each window is a
    uniform 64-bit hash, so its lexicographic min is a valid min-hash,
    and deriving all k from a single digest cuts the dominant
    signature cost k-fold versus hashing k seeded copies (the round-1
    scheme). Windows overlap by 14 hex chars, so estimates are mildly
    correlated — irrelevant here because LSH only generates candidates
    and exact Jaccard verifies. Catalyst's subexpression elimination
    evaluates the shared ``transform(shingles, md5)`` once per row.

    k ≤ 9 keeps every window inside the 32-hex digest (no wraparound).

    The hash closure MUST be built by a factory taking one lambda
    parameter: a two-parameter lambda (``lambda s, i=i``) is treated
    by Spark's higher-order functions as the (element, index) form,
    silently binding the array-index Column to ``i``.
    """
    if k > 9:
        raise ValueError("k must be ≤ 9 (64-bit windows of a 128-bit digest)")
    digests = F.transform(shingle_col, lambda s: F.md5(s))

    # Single fold over the digest array holding all k running mins in
    # the accumulator. Building k separate array_min(transform(...))
    # expressions re-evaluates the md5 transform per hash — Catalyst's
    # subexpression elimination does not share a non-trivial lambda
    # subtree across sibling expressions (measured: 8 window-mins cost
    # the same as 8 seeded md5 passes). The fold references ``digests``
    # exactly once, so md5 runs once per shingle; '~' (0x7E) sorts
    # after every hex char and marks "no shingles" → null, matching
    # array_min's empty-array behavior.
    init = F.array(*[F.lit("~") for _ in range(k)])

    def fold_mins(acc: Column, h: Column) -> Column:
        return F.array(
            *[
                F.least(F.element_at(acc, i + 1), F.substring(h, 1 + 2 * i, 16))
                for i in range(k)
            ]
        )

    sig = F.aggregate(digests, init, fold_mins)
    return F.transform(sig, lambda m: F.when(m == "~", F.lit(None)).otherwise(m))


def lsh_candidate_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    sig_col: str = "signature",
    band_size: int = 2,
) -> DataFrame:
    """Pairs sharing at least one LSH band bucket (id_a < id_b).

    Scale shape: explode to (band_idx, bucket) — k/band_size rows per
    doc — then self-join on the bucket. The join key space is the
    bucket domain, so co-bucketed docs only ever meet; AQE splits any
    hot bucket.
    """
    sig = F.col(sig_col)
    n_bands = (F.size(sig) / band_size).cast("int")
    bands = df.select(
        F.col(id_col),
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), n_bands - 1),
                lambda b: F.md5(
                    F.concat_ws("|", F.slice(sig, b * band_size + 1, F.lit(band_size)))
                ),
            )
        ).alias("band_idx", "bucket"),
    )
    a = bands.alias("a")
    b = bands.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b"))
        .distinct()
    )


def jaccard_micro(set_a: Column, set_b: Column) -> Column:
    """⌊10⁶·|A∩B|/|A∪B|+0.5⌋ as BIGINT (portable quantization)."""
    inter = F.size(F.array_intersect(set_a, set_b)).cast("double")
    union = F.size(F.array_distinct(F.concat(set_a, set_b))).cast("double")
    # try_divide: empty/empty pair yields NULL (matches DuckDB x/0 = NULL
    # under ANSI mode instead of DIVIDE_BY_ZERO).
    return F.floor(F.try_divide(F.lit(1e6) * inter, union) + F.lit(0.5)).cast("bigint")


def minhash_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
    band_size: int = 2,
    shingle_n: int = 2,
    threshold_micro: int = 500_000,
) -> DataFrame:
    """End-to-end MinHash-LSH near-dup detection: verified pairs.

    The shingle→signature projection (k·|shingles| hashes per row) is
    the dominant cost and is consumed FOUR times downstream (band
    self-join ×2, verification join ×2), so it is fanned out across
    every core and persisted — at 100 TB the persisted frame is
    (id, shingles, signature), far smaller than the raw text, and
    MEMORY_AND_DISK spills gracefully instead of recomputing.
    """
    from pyspark import StorageLevel

    from kinesis_producer_spark.tables import fan_out

    sh = fan_out(df).select(F.col(id_col), shingles(text_col, shingle_n).alias("sh"))
    sh = sh.withColumn("signature", minhash_signature(sh, F.col("sh"), k=k))
    sh = sh.persist(StorageLevel.MEMORY_AND_DISK)
    pairs = lsh_candidate_pairs(sh, id_col=id_col, sig_col="signature", band_size=band_size)
    a = sh.select(F.col(id_col).alias("id_a"), F.col("sh").alias("sh_a"))
    b = sh.select(F.col(id_col).alias("id_b"), F.col("sh").alias("sh_b"))
    # Size-ratio prefilter (result-preserving): |A∩B| ≤ min and
    # |A∪B| ≥ max give J ≤ min/max, and floor(1e6·x+0.5) is monotone,
    # so a pair whose quantized size-ratio bound is below the threshold
    # cannot verify. Two integer size comparisons prune the O(|sh|)
    # intersect/union work per candidate — at high-recall bandings
    # (band_size=1) candidates outnumber true pairs ~100:1.
    sza, szb = F.size(F.col("sh_a")).cast("double"), F.size(F.col("sh_b")).cast("double")
    # try_divide: an empty/empty candidate pair (both docs shingle-less)
    # must yield NULL (filtered) — ANSI mode throws on plain 0.0/0.0,
    # exactly the hazard jaccard_micro already guards.
    bound = F.floor(
        F.try_divide(F.lit(1e6) * F.least(sza, szb), F.greatest(sza, szb)) + F.lit(0.5)
    ).cast("bigint")
    # ``shingles`` returns DISTINCT grams by construction, so
    # |A∪B| = |A|+|B|−|A∩B| exactly — the per-pair
    # array_distinct(concat(...)) set build (half the per-pair work at
    # band_size=1's ~100:1 candidate ratio) is replaced by the two
    # sizes already computed for the prefilter; same division, same
    # operands, oracle-identical (the q170 round-8 measurement:
    # 6.8→4.1s solo). Empty/empty pairs still yield NULL via
    # try_divide (union size 0), matching the oracle's x/0.
    inter = F.size(F.array_intersect(F.col("sh_a"), F.col("sh_b"))).cast("double")
    union = sza + szb - inter
    jac = F.floor(
        F.try_divide(F.lit(1e6) * inter, union) + F.lit(0.5)
    ).cast("bigint")
    verified = (
        pairs.join(a, "id_a")
        .join(b, "id_b")
        .filter(bound >= threshold_micro)
        .select("id_a", "id_b", jac.alias("jaccard_micro"))
    )
    return verified.filter(F.col("jaccard_micro") >= threshold_micro)


def _hex_high(token: Column, i: int) -> Column:
    """True when hex digit i (0-based) of md5(token) is ≥ 8."""
    digit = F.substring(F.md5(token), i + 1, 1)
    # position in '0123456789abcdef' is value+1 → value ≥ 8 ⇔ pos ≥ 9
    pos = F.array_position(F.array(*[F.lit(c) for c in HEX]), digit)
    return pos >= 9


def simhash16(col: Column | str) -> Column:
    """16-bit SimHash over whitespace tokens.

    Bit i = majority over tokens of (hex digit i of md5(token) ≥ 8);
    expressed with higher-order functions only — per-row, JVM-side,
    zero shuffle.
    """
    w = words(col)
    total = F.lit(0)

    def _voter(i: int):
        # closure factory, NOT a default arg: `lambda acc, t, i=i` would
        # have arity 3 and Spark would resolve the 3-arg merge variant
        return lambda acc, t: acc + F.when(_hex_high(t, i), F.lit(1)).otherwise(F.lit(-1))

    for i in range(16):
        vote = F.aggregate(w, F.lit(0), _voter(i))
        total = total + F.when(vote > 0, F.lit(1 << i)).otherwise(F.lit(0))
    # null text must surface as null, not as the all-zero hash
    c = F.col(col) if isinstance(col, str) else col
    return F.when(c.isNull(), F.lit(None)).otherwise(total).cast("bigint")


def connected_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 20,
) -> DataFrame:
    """Duplicate-cluster assignment: each node's label converges to the
    minimum id in its connected component (min-label propagation).

    The iterative shape is the standard Spark pattern for graph
    fixpoints: per round, every node takes the min of its own label and
    its neighbors' labels — one shuffle per round, rounds ≈ graph
    diameter (dup clusters are shallow). localCheckpoint truncates
    lineage so plans don't grow with iterations; convergence is an
    exact changed-label count (an action per round, aggregate-only).
    """
    # Partition the symmetrized edges on the per-round join key before
    # checkpointing so each propagation round reuses the exchange
    # instead of re-shuffling the edge list.
    edges = (
        pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
        .union(pairs.select(F.col(id_b).alias("src"), F.col(id_a).alias("dst")))
        .distinct()
        .repartition("src")
        .localCheckpoint()
    )
    labels = (
        edges.select(F.col("src").alias("id"))
        .distinct()
        .select("id", F.col("id").alias("label"))
        .localCheckpoint()
    )
    for _ in range(max_iter):
        msgs = (
            edges.join(labels, edges.src == labels.id)
            .select(
                F.col("dst").alias("id"),
                "label",
                F.lit(None).cast(dict(labels.dtypes)["label"]).alias("old"),
            )
        )
        # Convergence check fused into the propagation aggregate: the
        # node's own row carries its previous label through the union,
        # so "did anything change" is a filter over the checkpointed
        # result — no extra join (and no extra shuffle) per round.
        agg = (
            labels.select("id", "label", F.col("label").alias("old"))
            .unionByName(msgs)
            .groupBy("id")
            .agg(F.min("label").alias("label"), F.max("old").alias("old"))
            .localCheckpoint()
        )
        changed = agg.filter(F.col("label") < F.col("old")).count()
        labels = agg.select("id", "label")
        if changed == 0:
            break
    return labels.select(F.col("id").alias("doc_id"), F.col("label").alias("cluster_id"))


def passjoin_candidate_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    str_col: str = "pfx",
    k: int = 3,
    slen: int = 24,
    block_col: str | None = None,
) -> DataFrame:
    """PassJoin segment blocking for edit-distance ≤ ``k`` self-join
    over fixed-length strings (Li et al., "PASS-JOIN: a partition-based
    method for similarity joins", ICDE 2011 — public algorithm).

    Pigeonhole for equal-length strings: ≤k edit operations leave at
    least one of the k+1 disjoint segments untouched, and the surviving
    segment appears in the other string shifted by at most k positions.
    The index side explodes its k+1 canonical segments; the probe side
    explodes every segment window shifted by δ ∈ [-k, k]; candidates
    join on (block, segment_id, gram). Complete (never drops a true
    pair) but not minimal — callers run the exact verifier on the
    candidate set.

    Returns (id_a, id_b, str_a, str_b) with id_a < id_b, deduplicated.
    At 100 TB the join key cardinality is segment-value space, not the
    block key, so one hot block no longer costs O(block²).
    """
    if slen % (k + 1) != 0:
        raise ValueError("slen must be divisible by k+1 for equal segments")
    seg = slen // (k + 1)
    blocks = [block_col] if block_col else []
    base = df.select(
        *blocks, F.col(id_col).alias("_id"), F.col(str_col).alias("_s")
    )
    index_side = base.select(
        *blocks,
        F.col("_id").alias("id_a"),
        F.col("_s").alias("str_a"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("seg_id"),
                        F.substring("_s", i * seg + 1, seg).alias("gram"),
                    )
                    for i in range(k + 1)
                ]
            )
        ).alias("x"),
    ).select(*blocks, "id_a", "str_a", "x.seg_id", "x.gram")
    probe_side = base.select(
        *blocks,
        F.col("_id").alias("id_b"),
        F.col("_s").alias("str_b"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("seg_id"),
                        F.substring("_s", start + 1, seg).alias("gram"),
                    )
                    for i in range(k + 1)
                    for start in sorted(
                        {min(max(i * seg + d, 0), slen - seg) for d in range(-k, k + 1)}
                    )
                ]
            )
        ).alias("x"),
    ).select(*blocks, "id_b", "str_b", "x.seg_id", "x.gram")
    return (
        index_side.join(probe_side, blocks + ["seg_id", "gram"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "str_a", "str_b")
        .dropDuplicates(["id_a", "id_b"])
    )
