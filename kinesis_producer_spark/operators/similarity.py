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

# Centroid-scan block width for the trained-quantizer UDFs: bounds the
# per-task scratch at batch·_CELL_BLOCK int64s (~20 MB at a 10k-row
# Arrow batch) however many cells ivf_auto_cells chooses (≤ 65 536).
_CELL_BLOCK = 256


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


def ivf_auto_cells(n: int, target_cell: int = 256, max_cells: int = 65_536) -> int:
    """Corpus-size-scaled cell count for the TRAINED coarse quantizer:
    the ``semdedup_auto_bits`` law expressed in cells —
    2^clamp(⌈log₂(n/target_cell)⌉, 1, 16) — so the expected cell
    population stays ≤ ``target_cell`` as the corpus grows and, with a
    fixed nprobe, the probed FRACTION (nprobe/n_cells) SHRINKS with
    corpus size. That is the property the sign-bit quantizer lacks
    (its probed fraction is a corpus-independent (bits+1)/2^bits) and
    the reason the serving family trains cells at scale. target_cell
    defaults higher than SemDeDup's 64 because serving scans probed
    cells linearly (no within-cell pair blowup to bound)."""
    import math

    if n <= 0:
        return 2
    return 1 << max(1, min(16, math.ceil(math.log2(max(1.0, n / target_cell)))))


def ivf_serving_config(n: int, target_recall: float = 0.7) -> tuple[int, int]:
    """The MEASURED (n_cells, nprobe) operating point for the trained
    serving family (round-9 verdict #2) — encodes the q258 exploration
    sweep's frontier instead of leaving the recall lever undefaulted.
    Sweep (30 queries, recall@10 vs probed fraction, shortlist 50,
    lowest-id PQ codes — the registered q257/q258 protocol):

    ========  =========  ========  ==========
    fixture   cells×np   recall    probed
    ========  =========  ========  ==========
    sf0.01    16×2       56%       12.3%
    sf0.01    32×4       **79%**   12.9%
    sf0.01    64×8       76%       14.6%
    sf0.01    128×4      52%       4.5%
    sf0.1     16×2       48%       12.6%
    sf0.1     64×2       **85%**   3.1%
    sf0.1     128×4      77%       3.3%
    sf0.1     16×8       44%       50.2%
    ========  =========  ========  ==========

    The lever is CELL COUNT at a bounded probe width, not probe width
    at a fixed cell count: recall peaks where the expected cell
    population n/cells sits near 16–32 (cells track real clusters;
    beyond that they starve), and widening nprobe past ~4 at fixed
    cells LOWERS recall here because the fixed-width shortlist fills
    with PQ-noise from extra cells (16×2→16×8 drops 56→59→44%).
    So: ``target_recall >= 0.65`` → expected cell population 16 with
    nprobe=4 (the 79%/77% frontier rows at ≤15%/≤4% probed);
    below that → the ivf_auto_cells default (population 256) with
    nprobe=2, the round-8 low-scan point (48–56% at ~12%).

    The probed FRACTION (nprobe/cells) shrinks as the corpus grows in
    both tiers (ivf_auto_cells caps at 65 536 cells); the q258 gate is
    the re-check before trusting the fixture-measured law at a new
    scale or distribution."""
    if target_recall >= 0.65:
        cells = ivf_auto_cells(n, target_cell=16)
        nprobe = 4
    else:
        cells = ivf_auto_cells(n)
        nprobe = 2
    return cells, min(nprobe, cells)


def filtered_probe_width(nprobe: int, selectivity: float, n_cells: int) -> int:
    """The serving-side lever for FILTERED ANN (q270/q271): with a
    predicate keeping ~``selectivity`` of the corpus, a probed cell
    holds ~selectivity·(n/cells) qualifying rows, so matching the
    unfiltered path's candidate count takes ~nprobe/selectivity cells
    — widen the probe list, capped at ``n_cells`` (a 10% predicate at
    the 32×4 point probes all 32 cells, i.e. degrades gracefully to a
    filtered flat-ADC scan). A per-request parameter: the index, the
    codes and the partition layout are untouched — only the
    partition-filter IN-list grows, which is exactly the knob a
    100 TB serving tier can turn per query.

    ``selectivity == 0`` means the predicate matched NO rows (the
    q270 pattern measures sel = matched/n, and an empty match is a
    legitimate request, round-9 ADVICE): the result set is empty at
    ANY width, so the cheapest correct answer is the narrowest scan —
    the unwidened ``nprobe``."""
    if not 0 <= selectivity <= 1:
        raise ValueError(f"selectivity must be in [0, 1], got {selectivity}")
    import math

    if selectivity == 0:
        return min(nprobe, n_cells)
    return max(nprobe, min(int(math.ceil(nprobe / selectivity)), n_cells))


def _trained_parts(
    centroids: list[list[int]],
    nprobe: int = 1,
    adapt: tuple[int, int] | None = None,
):
    """Assignment/probe expression builders over TRAINED micro-int
    centroids (list index = cid): ``cell_fn(emb)`` → nearest-centroid
    id (squared L2 in micro-ints, ties to the lowest cid — a strict
    running-min update scanned in ascending cid order IS the oracle's
    ROW_NUMBER ORDER BY d2, cid), and ``probes_fn(emb)`` → the
    ``nprobe`` nearest centroid ids as array<int> (lexsort by
    (d2, cid) keeps the same tie rule). Both are Arrow-vectorized
    pandas UDFs over int64 numpy — the per-row work is |cells|·dim
    multiply-adds, exactly the shape the round-7 measurements banned
    from column expressions — and both are integer-exact, so the SQL
    oracle reproduces every assignment.

    ``adapt=(num, den)`` makes the probe list PER-QUERY ADAPTIVE
    (round-9 verdict #5): ``nprobe`` becomes the CEILING and the i-th
    nearest centroid (i ≥ 1) is probed only while its distance stays
    within the ratio of the nearest — ``d2_i · den ≤ d2_0 · num`` —
    so a query deep inside one cell probes that cell alone while a
    boundary query keeps its full width. Integer-exact (one int64
    multiply each side; micro-int d2 ≤ ~2.6e14 at dim 64, so small
    ratios never overflow), hence oracle-expressible as a predicate
    on the same ROW_NUMBER frame. The nearest cell is always probed.

    Scratch is bounded at batch·(dim + _CELL_BLOCK) int64s: centroids
    are scanned in ``_CELL_BLOCK``-cell blocks with a running
    min/top-nprobe carried between blocks, so ``ivf_auto_cells``'
    65 536-cell ceiling never materializes a (batch × n_cells)
    distance matrix per task (a default ~10k-row Arrow batch at 64k
    cells would be ~5 GB — the round-8 ADVICE finding)."""
    import numpy as np
    import pandas as pd

    if adapt is not None:
        # degenerate ratios silently corrupt the keep mask (den=0
        # keeps full width, negative den keeps rank 0 only) and
        # diverge from the oracle's predicate — fail loudly instead
        # (round-10 ADVICE)
        a_num, a_den = adapt
        if not (
            isinstance(a_num, int)
            and isinstance(a_den, int)
            and a_num >= 1
            and a_den >= 1
        ):
            raise ValueError(
                f"adapt=(num, den) must be integers >= 1, got {adapt!r}"
            )
    cmat = np.array(centroids, dtype=np.int64)  # (C, dim)
    n_c = len(cmat)
    dim = cmat.shape[1] if n_c else 0
    k_probe = min(nprobe, n_c)
    # Exact-GEMM guard: d2 = |v|² − 2v·c + |c|² via float64 BLAS is
    # EXACT when every intermediate integer fits in float64's 53-bit
    # mantissa — |vm|,|cm| ≤ M ⇒ partial sums ≤ 2·dim·M², so M ≤
    # √(2⁵³/(2·dim)) (≈ 8.4e6 at dim 64, i.e. raw values ≤ ±8.4 —
    # every embedding in this engine is micro-quantized from O(1)
    # cosine space). The GEMM path is ~100× the per-cell int64 loop
    # (BLAS vs python-loop temporaries) and bit-identical under the
    # guard; out-of-range inputs fall back to the exact loop.
    _gemm_max = int((2**53 / max(2 * dim, 1)) ** 0.5) if dim else 0
    _cf = cmat.astype(np.float64)
    _cc = (_cf * _cf).sum(axis=1)  # (C,)
    _cmat_ok = bool(n_c) and int(np.abs(cmat).max()) <= _gemm_max

    def _d2_block(vm: "np.ndarray", lo: int, hi: int) -> "np.ndarray":
        if _cmat_ok and int(np.abs(vm).max(initial=0)) <= _gemm_max:
            vf = vm.astype(np.float64)
            d2 = (
                (vf * vf).sum(axis=1)[:, None]
                - 2.0 * (vf @ _cf[lo:hi].T)
                + _cc[lo:hi][None, :]
            )
            return d2.astype(np.int64)
        out = np.empty((len(vm), hi - lo), dtype=np.int64)
        for c in range(lo, hi):
            diff = vm - cmat[c]
            out[:, c - lo] = (diff * diff).sum(axis=1)
        return out

    def _vm(embs: pd.Series) -> "np.ndarray":
        v = np.stack([np.asarray(e, dtype=np.float64) for e in embs])
        return np.floor(1e6 * v + 0.5).astype(np.int64)

    def _cells(embs):
        if len(embs) == 0:
            return pd.Series([], dtype="int32")
        vm = _vm(embs)
        best_d = None
        best_c = None
        for lo in range(0, n_c, _CELL_BLOCK):
            hi = min(lo + _CELL_BLOCK, n_c)
            d = _d2_block(vm, lo, hi)
            b_c = d.argmin(axis=1)
            b_d = d[np.arange(len(vm)), b_c]
            if best_d is None:
                best_d, best_c = b_d, b_c.astype(np.int64) + lo
            else:
                # strict < keeps the lowest cid on ties (blocks ascend)
                upd = b_d < best_d
                best_d = np.where(upd, b_d, best_d)
                best_c = np.where(upd, b_c.astype(np.int64) + lo, best_c)
        return pd.Series(best_c.astype(np.int32))

    def _probes(embs):
        if len(embs) == 0:
            return pd.Series([], dtype=object)
        vm = _vm(embs)
        run_d = None  # (n, ≤k_probe) running top distances
        run_c = None
        for lo in range(0, n_c, _CELL_BLOCK):
            hi = min(lo + _CELL_BLOCK, n_c)
            d = _d2_block(vm, lo, hi)
            c = np.broadcast_to(
                np.arange(lo, hi, dtype=np.int64), d.shape
            )
            if run_d is not None:
                d = np.concatenate([run_d, d], axis=1)
                c = np.concatenate([run_c, c], axis=1)
            if d.shape[1] > k_probe:
                # exact (d2, cid) order on the bounded candidate set:
                # np.argsort is stable and equal-d candidates within a
                # row appear in ascending-cid order by construction
                # (the running top preserved it, block cids all exceed
                # run cids), so ties keep the lowest cid
                sel = np.argsort(d, axis=1, kind="stable")[:, :k_probe]
                rows = np.arange(len(vm))[:, None]
                d, c = d[rows, sel], c[rows, sel]
            run_d, run_c = d, c
        rows = np.arange(len(vm))[:, None]
        sel = np.argsort(run_d, axis=1, kind="stable")
        run_c = run_c[rows, sel]
        if adapt is None:
            return pd.Series(list(run_c.astype(np.int32)))
        num, den = adapt
        run_d = run_d[rows, sel]
        # distances ascend along the row, so the ratio test keeps a
        # PREFIX of the width-nprobe list; rank 0 always survives
        keep = run_d * den <= run_d[:, :1] * num
        keep[:, 0] = True
        return pd.Series(
            [c[k].astype(np.int32) for c, k in zip(run_c, keep)]
        )

    cell_udf = F.pandas_udf(_cells, "int")
    probes_udf = F.pandas_udf(_probes, "array<int>")

    def cell_fn(emb: Column) -> Column:
        return cell_udf(emb)

    def probes_fn(emb: Column) -> Column:
        return probes_udf(emb)

    return cell_fn, probes_fn


def _collect_centroids_by(
    corpus: DataFrame, cell_col: Column, emb_col: str
) -> dict[int, list[int]]:
    """Per-cell per-dimension micro-int mean keyed by an ARBITRARY
    cell expression (the q235 integer-exact form: int64 sums, one
    fixed-order double division, floor). One map-side-combinable
    aggregation pass; the collect is bounded control data
    (|cells|·dim rows). Shared by the sign-bit residual path and the
    trained quantizer's Lloyd M-step.

    Physical shape (optimization round 13, guide §4.2): the per-row
    work — micro-quantize every element and partially sum it per
    (cell, d) — runs as blocked numpy inside ONE mapInPandas pass
    emitting ≤ |cells|·dim partial rows per task, instead of a JVM
    posexplode to |train|·dim rows through a hash aggregate. The
    exchange carries the same (cell, d) partials as before (map-side
    combine made them partial either way); the merge divides once in
    the identical expression. Bit-exact: ⌊10⁶·x + 0.5⌋ per element is
    the same IEEE double op in numpy, int64 partial sums are exact,
    and the final cast-to-double + divide + floor is unchanged JVM
    arithmetic over the identical sums and counts."""
    import numpy as np
    import pandas as pd

    src = corpus.select(cell_col.alias("cell"), F.col(emb_col).alias("_e"))

    def partials(batches):
        sums: dict[int, "np.ndarray"] = {}
        cnts: dict[int, int] = {}
        for pdf in batches:
            if not len(pdf):
                continue
            cells = pdf["cell"].to_numpy()
            mat = np.stack([np.asarray(x, np.float64) for x in pdf["_e"]])
            vm = np.floor(1e6 * mat + 0.5).astype(np.int64)
            uniq, inv = np.unique(cells, return_inverse=True)
            smat = np.zeros((len(uniq), vm.shape[1]), dtype=np.int64)
            np.add.at(smat, inv, vm)  # int64-exact scatter-add
            nvec = np.bincount(inv, minlength=len(uniq))
            for i, c in enumerate(uniq):
                key = int(c)
                if key in sums:
                    sums[key] += smat[i]
                    cnts[key] += int(nvec[i])
                else:
                    sums[key] = smat[i]
                    cnts[key] = int(nvec[i])
        if not sums:
            yield pd.DataFrame(
                {
                    "cell": np.array([], np.int64),
                    "d": np.array([], np.int32),
                    "s": np.array([], np.int64),
                    "n": np.array([], np.int64),
                }
            )
            return
        cells_arr = np.fromiter(sums.keys(), np.int64, len(sums))
        smat = np.stack(list(sums.values()))
        nvec = np.fromiter(cnts.values(), np.int64, len(cnts))
        dim = smat.shape[1]
        yield pd.DataFrame(
            {
                "cell": np.repeat(cells_arr, dim),
                "d": np.tile(np.arange(dim, dtype=np.int32), len(cells_arr)),
                "s": smat.ravel(),
                "n": np.repeat(nvec, dim),
            }
        )

    cen = (
        src.mapInPandas(partials, "cell long, d int, s long, n long")
        .groupBy("cell", "d")
        .agg(
            F.floor(
                F.sum("s").cast("double") / F.sum("n") + F.lit(0.5)
            )
            .cast("bigint")
            .alias("cm")
        )
    )
    # collect ONE row per cell (dims packed as a d-sorted array), not
    # one per (cell, d): the control data is |cells|·dim ints either
    # way, but py4j Row conversion is per-ROW — at the auto-scaled
    # 2048-cell point the flat collect was 131k Rows and dominated the
    # whole Lloyd round (round-9 soak finding); packed it is |cells|
    # rows (64× fewer)
    rows = cen.groupBy("cell").agg(
        F.array_sort(F.collect_list(F.struct("d", "cm"))).alias("dims")
    ).collect()  # bounded: |cells| rows of dim structs
    out: dict[int, list[int]] = {}
    for r in rows:
        out[int(r["cell"])] = [int(p["cm"]) for p in r["dims"]]
    return out


def train_sample(
    corpus: DataFrame, sample_rows: int, id_col: str = "vec_id"
) -> DataFrame:
    """Deterministic bounded TRAINING sample for the quantizer
    builders — FAISS's discipline (k-means never needs the whole
    corpus; IndexIVF caps training at ~256 points per centroid) made
    oracle-expressible: the ``sample_rows`` first rows in
    (md5(CAST(id AS STRING)), id) order. md5 gives a content-blind
    pseudo-random order that Spark and the SQL oracle compute
    identically (both emit lowercase hex; the id tie-break makes the
    limit exact), so the sampled Lloyd protocol stays bit-reproducible
    end to end. Physically a TakeOrderedAndProject — per-partition
    top-s + driver merge, no shuffle of the corpus."""
    return corpus.orderBy(
        F.md5(F.col(id_col).cast("string")), F.col(id_col)
    ).limit(sample_rows)


def train_ivf_centroids(
    corpus: DataFrame,
    n_cells: int | None = None,
    rounds: int = 2,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    sample_rows: int | None = None,
) -> list[list[int]]:
    """TRAINED coarse quantizer for the IVF serving family — the
    round-7 verdict's #1: k-means centroids via ``rounds`` Lloyd
    iterations, integer-exact end to end so the SQL oracle unrolls
    the same fixed protocol. Init = the ``n_cells`` lowest-id corpus
    rows micro-quantized (rank order = cid — the q255 frozen-codebook
    convention, hole-tolerant); E-step = nearest centroid by int64
    squared L2, ties to the lowest cid; M-step = per-cell per-dim
    ⌊Σvm/count + 0.5⌋ (ONE double division, the q235 expression); an
    empty cell keeps its previous centroid. Returns list index = cid.

    ``n_cells=None`` derives the cell count from the corpus size
    (``ivf_auto_cells`` — nprobe/n_cells probed fraction then SHRINKS
    as the corpus grows, which is the whole point of training).

    Scale: each round is one full corpus pass (Arrow-vectorized
    assignment — a zero-shuffle projection against broadcast centroid
    literals — feeding one map-side-combinable dim aggregate); the
    centroid state is bounded driver control data (n_cells·dim ints),
    same discipline as _collect_codebook. rounds is FIXED, not
    converge-tested — determinism and oracle-reproducibility over the
    last fraction of inertia (Lloyd gets most of its improvement in
    the first iterations on clustered data).

    ``sample_rows`` bounds the TRAINING set (``train_sample`` — the
    deterministic md5-ordered prefix): with ``ivf_auto_cells`` making
    n_cells ∝ n, full-corpus Lloyd rounds are O(n²·dim/target_cell)
    per build — the one superlinear build pass the round-9 soak
    adjudicated. Sampling caps the rounds at O(s·n_cells·dim) and
    leaves ONE full-corpus assignment pass (the IVF add — inherent:
    every served vector must find its nearest cell once, GEMM-backed
    and cells-capped). Init = the n_cells lowest-id rows OF THE
    SAMPLE; a sample that covers the corpus (sample_rows ≥ n) is
    bit-identical to full training (order-independent E/M steps,
    identical init)."""
    import math

    from kinesis_producer_spark.tables import fan_out

    if n_cells is None:
        n_cells = ivf_auto_cells(corpus.count())
    train = corpus
    if sample_rows is not None:
        # bounded control-sized frame; eager localCheckpoint so the
        # rounds re-read the materialized sample instead of re-running
        # the corpus-wide ordered limit every Lloyd round
        train = train_sample(corpus, sample_rows, id_col).localCheckpoint(
            eager=True
        )
    rows = _codebook_rows(train, id_col, emb_col, n_cells)
    # the E-step is |train|·n_cells·dim of Arrow work per round — a
    # one-file fixture arrives as one split and serializes it; no-op
    # at real scale (fan_out's contract)
    train = fan_out(train)
    cent = [
        [int(math.floor(1e6 * float(v) + 0.5)) for v in r["e"]] for r in rows
    ]
    for _ in range(rounds):
        cell_fn, _ = _trained_parts(cent)
        upd = _collect_centroids_by(train, cell_fn(F.col(emb_col)), emb_col)
        cent = [upd.get(c, cent[c]) for c in range(n_cells)]
    return cent


def _pq_mstep(
    with_codes: DataFrame,
    prev: list[list[int]],
    m_dims: int,
    val_col: str,
    quantize: bool,
) -> list[list[int]]:
    """Shared Lloyd M-step for the per-subspace PQ protocol: per
    (cid, d) micro-int mean — int64 sums, ONE fixed-order double
    division, floor (the q235 expression) — where ``cid`` is the
    row's code in dimension d's subspace (``_codes[d div m_dims]``).
    ONE pass updates ALL M sub-codebooks at once (m = d div m_dims is
    a function of d, so grouping by (cid, d) IS grouping by
    (cid, m, dd)); the collect is bounded control data (≤ K·dim
    rows). An empty (cid, m) cell has no rows for ANY of its dims, so
    per-(cid, d) defaulting to the previous value is exactly the
    oracle's per-(cid, m) keep-previous UNION ALL guard.

    Physical shape (optimization round 13, guide §4.2/§2.2): the
    per-row work — micro-quantize (when ``quantize``) and partially
    sum per (cid, d) — runs as blocked numpy inside ONE mapInPandas
    pass emitting ≤ K·dim partial rows per task, instead of a JVM
    posexplode to |corpus|·dim rows through a hash aggregate. The
    merge divides once over the identical int64 sums and counts, so
    the result is bit-exact vs the exploded form (⌊10⁶·x + 0.5⌋ per
    element is the same IEEE double op in numpy; scatter-adds stay in
    int64)."""
    import numpy as np
    import pandas as pd

    n_cent = len(prev)
    dim = len(prev[0])
    n_sub = dim // m_dims

    def partials(batches):
        sums = np.zeros((n_cent, dim), dtype=np.int64)
        cnts = np.zeros((n_cent, dim), dtype=np.int64)
        for pdf in batches:
            if not len(pdf):
                continue
            codes = np.stack(
                [np.asarray(c, np.int64) for c in pdf["_codes"]]
            )
            if quantize:
                mat = np.stack(
                    [np.asarray(x, np.float64) for x in pdf[val_col]]
                )
                vm = np.floor(1e6 * mat + 0.5).astype(np.int64)
            else:
                vm = np.stack(
                    [np.asarray(x, np.int64) for x in pdf[val_col]]
                )
            for m in range(n_sub):
                blk = slice(m * m_dims, (m + 1) * m_dims)
                cid = codes[:, m]
                np.add.at(sums[:, blk], cid, vm[:, blk])
                cnts[:, blk] += np.bincount(cid, minlength=n_cent)[
                    :, None
                ]
        mask = cnts > 0
        kk, dd = np.nonzero(mask)
        yield pd.DataFrame(
            {
                "cid": kk.astype(np.int64),
                "d": dd.astype(np.int32),
                "s": sums[mask],
                "n": cnts[mask],
            }
        )

    rows = (
        with_codes.select("_codes", val_col)
        .mapInPandas(partials, "cid long, d int, s long, n long")
        .groupBy("cid", "d")
        .agg(
            F.floor(F.sum("s").cast("double") / F.sum("n") + F.lit(0.5))
            .cast("bigint")
            .alias("cm")
        )
        .collect()
    )
    new = [list(c) for c in prev]
    for r in rows:
        new[int(r["cid"])][int(r["d"])] = int(r["cm"])
    return new


def train_pq_codebooks(
    corpus: DataFrame,
    n_centroids: int = 16,
    m_dims: int = 8,
    rounds: int = 2,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    centroids: list[list[int]] | None = None,
    sample_rows: int | None = None,
) -> list[list[int]]:
    """TRAINED product-quantizer sub-codebooks — the round-8 verdict's
    #1: per-subspace k-means via ``rounds`` Lloyd iterations, the SAME
    fixed integer-exact protocol as ``train_ivf_centroids`` applied
    independently in each of the M = dim/m_dims subspaces, so the SQL
    oracle unrolls the identical per-subspace CTE chain. The lowest-id
    codebook (``_collect_codebook``) slices 16 SHARED rows into
    subspaces — M perfectly correlated sub-codebooks, collapsing PQ's
    16^M independent combinations (Jégou et al. 2011 §II) to ~16 and
    measurably recalling LESS than training-free SQ8; Lloyd rounds
    decorrelate them (each subspace converges toward its own
    marginal's centroids).

    Protocol per subspace m: init = the K lowest-id rows' m-th
    sub-vectors (rank-ordered cid — flat PQ's init exactly, so
    trained-vs-flat comparisons share a starting point); E-step =
    nearest sub-codebook entry by int64 squared L2 over the subspace's
    dims, ties to the lowest cid (np.argmin's first minimum — the
    oracle's ROW_NUMBER ORDER BY sd2, cid, and exactly
    ``_pq_expr_parts``' code assignment, which is REUSED as-is); M-step
    = per (cid, dim) ⌊Σvm/count + 0.5⌋; an empty (cid, m) cell keeps
    its previous sub-centroid. Returns the codebook in
    ``_collect_codebook``'s flat (K × dim) format — centroid k's
    subspace-m slice is the trained (k, m) sub-centroid — so it drops
    into every existing ``codebook=`` seam (q252's ivf_pq_topk,
    ivf_pq_write_index, the streaming appender) unchanged.

    ``centroids`` switches training to RESIDUAL space (the q262
    composition): cells come from the trained coarse quantizer, init
    subtracts each init row's own cell centroid (q262's codebook
    construction exactly), and Lloyd runs over x − centroid(cell(x))
    sub-vectors — the paper's construction, where the product
    quantizer codes residuals and therefore must be TRAINED on them.

    Scale: each round is ONE corpus pass — zero-shuffle Arrow code
    assignment against broadcast codebook literals feeding ONE
    map-side-combinable (cid, d) aggregate that updates all M
    sub-codebooks together (per-subspace jobs would be M corpus
    passes); codebook state is bounded driver control data
    (K·dim ints). ``rounds`` is FIXED, not converge-tested — the
    train_ivf_centroids determinism/oracle trade, verbatim.

    ``sample_rows`` bounds the training set exactly as in
    ``train_ivf_centroids`` (same ``train_sample`` prefix, init from
    the sample's lowest ids, sample_rows ≥ n bit-identical to full
    training); with K fixed the PQ rounds are already corpus-linear,
    so the knob here is build LATENCY, not a complexity class."""
    import math

    import numpy as np
    import pandas as pd

    from kinesis_producer_spark.tables import fan_out

    if sample_rows is not None:
        corpus = train_sample(corpus, sample_rows, id_col).localCheckpoint(
            eager=True
        )
    corpus = fan_out(corpus)  # per-round Arrow code passes on all cores
    if centroids is None:
        cb = _collect_codebook(corpus, id_col, emb_col, n_centroids)
        for _ in range(rounds):
            codes_fn, _, _ = _pq_expr_parts(cb, m_dims)
            with_codes = corpus.select(
                codes_fn(F.col(emb_col)).alias("_codes"),
                F.col(emb_col).alias("_e"),
            )
            cb = _pq_mstep(with_codes, cb, m_dims, "_e", quantize=True)
        return cb

    cell_fn, _ = _trained_parts(centroids)
    cen_dict = {i: list(v) for i, v in enumerate(centroids)}
    cb_rows = _codebook_rows(
        corpus, id_col, emb_col, n_centroids,
        cell_col=cell_fn(F.col(emb_col)),
    )
    cb = [
        [
            int(math.floor(1e6 * float(v) + 0.5)) - cen_dict[int(r["c"])][d]
            for d, v in enumerate(r["e"])
        ]
        for r in cb_rows
    ]
    cmat = np.array(centroids, dtype=np.int64)

    def _resid(embs, cells):
        if len(embs) == 0:
            return pd.Series([], dtype=object)
        v = np.stack([np.asarray(e, dtype=np.float64) for e in embs])
        vm = np.floor(1e6 * v + 0.5).astype(np.int64)
        rm = vm - cmat[np.asarray(cells, dtype=np.int64)]
        return pd.Series(list(rm))

    resid_udf = F.pandas_udf(_resid, "array<bigint>")
    for _ in range(rounds):
        codes_fn, _, _ = _pq_residual_parts(cb, cen_dict, m_dims)
        with_codes = corpus.select(
            F.col(emb_col).alias("_e"),
            cell_fn(F.col(emb_col)).alias("_cell"),
        ).select(
            codes_fn(F.col("_e"), F.col("_cell")).alias("_codes"),
            resid_udf(F.col("_e"), F.col("_cell")).alias("_rm"),
        )
        cb = _pq_mstep(with_codes, cb, m_dims, "_rm", quantize=False)
    return cb


def semdedup_auto_bits(
    n: int, target_cell: int = 64, max_bits: int = 16
) -> int:
    """Corpus-size-scaled coarse-quantizer width for the SemDeDup
    family: bits = clamp(⌈log₂(n / target_cell)⌉, 1, max_bits), so the
    EXPECTED cell population stays ≤ target_cell as the corpus grows.
    SemDeDup's within-cell compare is sum-of-|cell|² — with fixed bits
    a 100× denser corpus silently goes quadratic (the round-6
    SCALE.md adjudication this function encodes); paper-faithfully,
    the cluster count is a corpus-size parameter (Abbas et al. 2023
    use k ∝ corpus). max_bits=16 caps the quantizer at 65 536 sign-bit
    cells (the leading-dim signs run out of decorrelated information
    well before 64 bits; past that, switch the cell id to a trained
    coarse quantizer).

    Computed in INTEGER arithmetic (⌈log₂(n/t)⌉ = bit_length(⌈n/t⌉-1)
    — since 2^k ≥ n/t ⟺ 2^k ≥ ⌈n/t⌉ for integer 2^k), identical to
    the real-valued formula at every n and exactly reproducible in an
    oracle as LENGTH(BIN((n + t - 1) // t - 1)) — no float log2 whose
    rounding could flip the ceil at power-of-two boundaries."""
    if n <= 0:
        return 1
    m = (n + target_cell - 1) // target_cell
    return max(1, min(int(max_bits), (m - 1).bit_length()))


def semantic_dedup_keep_list(
    corpus: DataFrame,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    bits: int | None = None,
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

    ``bits=None`` (the default) derives the quantizer width from the
    corpus count (``semdedup_auto_bits`` — one cheap count job, a
    metadata-only scan on parquet), so cell density stays bounded as
    the corpus grows; pass an explicit ``bits`` to pin a width (the
    q231 fixture contract does).
    """
    from kinesis_producer_spark.tables import fan_out

    if bits is None:
        bits = semdedup_auto_bits(corpus.count())

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


def _codebook_rows(
    corpus: DataFrame,
    id_col: str,
    emb_col: str,
    n_centroids: int,
    cell_col: Column | None = None,
):
    """The ``n_centroids`` LOWEST-id corpus rows, through the ONE
    guarded gateway every codebook build path shares — a short corpus
    fails with the same explicit message everywhere instead of a bare
    IndexError from whichever path collected inline. Bounded control
    data (n_centroids rows); ``cell_col`` optionally rides along for
    the residual path's cell lookup."""
    cols = [F.col(id_col).alias("i"), F.col(emb_col).alias("e")]
    if cell_col is not None:
        cols.append(cell_col.alias("c"))
    rows = corpus.select(*cols).orderBy("i").limit(n_centroids).collect()
    if len(rows) < n_centroids:
        raise ValueError(
            f"codebook needs {n_centroids} rows, corpus has {len(rows)}"
        )
    return rows


def _collect_codebook(
    corpus: DataFrame, id_col: str, emb_col: str, n_centroids: int
) -> list[list[int]]:
    """The closed-form PQ codebook (centroid c = the c-th LOWEST-id
    corpus row, micro-quantized; on a dense-id corpus that is exactly
    the row with vec_id == c, which is what the SQL oracles encode)
    as driver-side literals. This is a BOUNDED control-data collect —
    n_centroids rows (16), the same discipline as the bloom/
    bucket-count collects — and it is what makes code assignment a
    zero-shuffle projection: the codebook rides into every task as
    K·dim integer literals instead of a join. Lowest-id (not
    ``id < K``) so an INCREMENTAL base corpus with id holes (q255)
    still yields a full codebook."""
    import math

    rows = _codebook_rows(corpus, id_col, emb_col, n_centroids)
    return [
        [int(math.floor(1e6 * float(v) + 0.5)) for v in r["e"]] for r in rows
    ]


def _pq_expr_parts(cb: list[list[int]], m_dims: int):
    """Shared expression builders over a literal codebook: returns
    (codes_fn, qd2_fn, adist_fn) where ``codes_fn(emb)`` yields the
    M-element array<int> of nearest centroid ids per subspace
    (squared L2 in micro-ints, ties to the lowest cid —
    array_position returns the FIRST minimum), ``qd2_fn(emb)`` the
    flattened M·K query distance table (index m·K + cid + 1), and
    ``adist_fn(codes, qd2)`` the table-lookup distance sum.

    The subspace-distance table (K·M squared-L2 sums, ~1k multiply-
    adds per row) is computed by an ARROW-VECTORIZED pandas UDF over
    int64 numpy — bit-exact with the SQL oracle (the micro
    quantization ⌊10⁶·v+0.5⌋ is one IEEE double op, then everything
    is int64; np.argmin's first-minimum tie-break IS the lowest-cid
    rule). Two pure-expression forms were measured first and
    rejected: nested transform/aggregate lambdas cost ~20 ms PER ROW
    (HOF lambda binding dominates) and a straight-line
    literal-codebook tree of ~2k terms still ~12 ms/row (the
    projection falls out of whole-stage codegen at that size into
    interpreted eval) — the numpy batch path is ~µs/row, the honest
    10-100× Arrow-UDF case. ``adist_fn`` stays a JVM expression
    (M table lookups per candidate). No explode, no shuffle: codes
    are one compact array<int> row per vector by construction."""
    import numpy as np
    import pandas as pd

    cmat = np.array(cb, dtype=np.int64)  # (K, dim)
    n_k, dim = cmat.shape
    n_m = dim // m_dims
    csub = cmat.reshape(n_k, n_m, m_dims)

    def _sd2_table(embs: pd.Series) -> "np.ndarray":
        """(n, K, M) int64 squared L2 per subspace; per-m loop keeps
        the scratch at n·K·m_dims instead of n·K·dim."""
        v = np.stack([np.asarray(e, dtype=np.float64) for e in embs])
        vm = np.floor(1e6 * v + 0.5).astype(np.int64)
        vsub = vm.reshape(len(embs), n_m, m_dims)
        out = np.empty((len(embs), n_k, n_m), dtype=np.int64)
        for m in range(n_m):
            diff = vsub[:, None, m, :] - csub[None, :, m, :]
            out[:, :, m] = (diff * diff).sum(axis=2)
        return out

    def _codes(embs):
        if len(embs) == 0:
            return pd.Series([], dtype=object)
        codes = _sd2_table(embs).argmin(axis=1).astype(np.int32)  # (n, M)
        return pd.Series(list(codes))

    def _qd2(embs):
        if len(embs) == 0:
            return pd.Series([], dtype=object)
        sd2 = _sd2_table(embs)  # (n, K, M)
        flat = sd2.transpose(0, 2, 1).reshape(len(embs), n_m * n_k)
        return pd.Series(list(flat))  # index m·K + cid

    # plain-function form (no annotations): `from __future__ import
    # annotations` stringifies hints, which pandas_udf's type-hint
    # inference rejects — same convention as sources/xml.py
    codes_udf = F.pandas_udf(_codes, "array<int>")
    qd2_udf = F.pandas_udf(_qd2, "array<bigint>")

    def codes_fn(emb: Column) -> Column:
        return codes_udf(emb)

    def qd2_fn(emb: Column) -> Column:
        return qd2_udf(emb)

    def adist_fn(codes_col: Column, qd2_col: Column) -> Column:
        total = None
        for m in range(n_m):
            term = F.element_at(
                qd2_col, m * n_k + F.element_at(codes_col, m + 1) + 1
            )
            total = term if total is None else total + term
        return total.cast("bigint")

    return codes_fn, qd2_fn, adist_fn


def _adc_shortlist_rerank(
    corpus: DataFrame,
    cand: DataFrame,
    adist_fn,
    query_ids: list[int],
    k: int,
    shortlist: int,
    id_col: str,
    emb_col: str,
    exclude_self: bool,
    extra_keys: tuple[str, ...] = (),
) -> DataFrame:
    """Shared tail of every IVF×PQ serving path (inline q252,
    index-backed q254/q255, residual q256, the q269 sweep):
    candidates → ADC lookup sum → per-query shortlist → exact-cosine
    re-rank (hoisted self-norms) → top-k. ``cand`` carries
    (query_id, vec_id, _codes, _qd2) — or a precomputed ``adist_q``
    with ``adist_fn=None``, the sweep's shape, where ADC ran once
    before an operating-point fan-out. ``extra_keys`` prepends
    grouping columns (the sweep's ``nprobe``) to every window
    partition, so the shortlist/tie-break rules live HERE once
    instead of in two hand-synced copies (round-9 ADVICE); the
    re-rank touches raw vectors for |keys|·shortlist rows only, and
    the exact same window tie-breaks keep every path row-comparable."""
    keys = [*extra_keys, "query_id"]
    if exclude_self:
        # recall-eval convention (q242/q253): the query must not
        # count itself as its own neighbor
        cand = cand.filter(F.col("vec_id") != F.col("query_id"))
    adist_col = (
        F.col("adist_q")
        if adist_fn is None
        else adist_fn(F.col("_codes"), F.col("_qd2"))
    )
    short = (
        cand.select(*keys, "vec_id", adist_col.alias("adist_q"))
        .withColumn(
            "srn",
            F.row_number().over(
                W.partitionBy(*keys).orderBy(
                    F.col("adist_q").asc(), F.col("vec_id")
                )
            ),
        )
        .filter(F.col("srn") <= shortlist)
        .drop("srn")
    )
    qe = corpus.filter(F.col(id_col).isin(*query_ids)).select(
        F.col(id_col).alias("query_id"),
        F.col(emb_col).alias("_qe"),
        qdot(F.col(emb_col), F.col(emb_col)).alias("_nq"),
    )
    ce = corpus.select(
        F.col(id_col).alias("vec_id"),
        F.col(emb_col).alias("_ce"),
        qdot(F.col(emb_col), F.col(emb_col)).alias("_nc"),
    )
    scored = (
        short.join(ce, "vec_id")
        .join(F.broadcast(qe), "query_id")
        .select(
            *keys,
            "vec_id",
            "adist_q",
            _cos_from_parts("_ce", "_qe", "_nc", "_nq").alias("cos_micro"),
        )
    )
    w = W.partitionBy(*keys).orderBy(F.col("cos_micro").desc(), F.col("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(*keys, "vec_id", "adist_q", "cos_micro", "rank")
    )


def ivf_pq_topk(
    corpus: DataFrame,
    query_ids: list[int],
    k: int = 10,
    shortlist: int = 50,
    bits: int = 3,
    n_centroids: int = 16,
    m_dims: int = 8,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    exclude_self: bool = False,
    codebook: list[list[int]] | None = None,
) -> DataFrame:
    """Composed IVF×PQ ANN — the production serving shape (Jégou et
    al. 2011 §IV, the IVFADC system): every corpus vector is assigned
    an IVF cell (sign-bit coarse quantizer, q56/q190's) AND an M-byte
    PQ code; a query probes its own cell plus every Hamming-distance-1
    cell (the q190 multi-probe recall fix), runs asymmetric-distance
    scoring ONLY over the probed cells' codes, keeps a ``shortlist``,
    and re-ranks exactly those candidates with the exact quantized
    cosine (q239's stage 2). Returns (query_id, vec_id, adist_q,
    cos_micro, rank).

    Scale — why this composes three existing operators instead of
    adding one: q234's flat ADC scans ALL n·M code rows per query
    batch, which at 100× corpus is the serving bottleneck; here the
    code scan is pruned to (bits+1)/2^bits of the corpus BEFORE ADC
    (at 100 TB the cell id is a partition column, so the probe list
    prunes parquet files), the ADC table and probe list are broadcast
    (|queries|·(bits+1) rows), code assignment is a ZERO-SHUFFLE
    projection (codes as one array<int> per vector against the
    broadcast literal codebook — no dim explosion), and raw vectors
    are touched only for |queries|·shortlist re-rank rows. The only
    corpus-order shuffle left is the per-query top-shortlist over
    probed candidates.

    ``codebook`` overrides the corpus-derived codebook with an
    externally FROZEN one (the staleness monitor q261 scores a stale
    base codebook against a rebuilt one over the drifted corpus)."""
    cb = (
        codebook
        if codebook is not None
        else _collect_codebook(corpus, id_col, emb_col, n_centroids)
    )
    codes_fn, qd2_fn, adist_fn = _pq_expr_parts(cb, m_dims)
    coded = corpus.select(
        F.col(id_col).alias("vec_id"),
        ivf_cell(F.col(emb_col), bits).alias("_cell"),
        codes_fn(F.col(emb_col)).alias("_codes"),
    )
    qc = ivf_cell(F.col(emb_col), bits)
    probes = F.array(qc, *[qc.bitwiseXOR(F.lit(1 << i)) for i in range(bits)])
    q = corpus.filter(F.col(id_col).isin(*query_ids)).select(
        F.col(id_col).alias("query_id"),
        F.explode(probes).alias("_cell"),
        qd2_fn(F.col(emb_col)).alias("_qd2"),
    )
    cand = coded.join(F.broadcast(q), "_cell")
    return _adc_shortlist_rerank(
        corpus, cand, adist_fn, query_ids, k, shortlist, id_col, emb_col,
        exclude_self,
    )


def ivf_pq_topk_trained(
    corpus: DataFrame,
    query_ids: list[int],
    k: int = 10,
    shortlist: int = 50,
    n_cells: int | None = 16,
    nprobe: int = 2,
    rounds: int = 2,
    n_centroids: int = 16,
    m_dims: int = 8,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    exclude_self: bool = False,
    centroids: list[list[int]] | None = None,
    codebook: list[list[int]] | None = None,
    sample_rows: int | None = None,
    where: Column | None = None,
    adapt_ratio: tuple[int, int] | None = None,
) -> DataFrame:
    """q252's IVF×PQ serving composition with the TRAINED coarse
    quantizer (Jégou et al. 2011 use k-means for the coarse stage;
    the sign-bit cell was the closed-form placeholder): cells are
    Lloyd-trained centroids (``train_ivf_centroids``) and a query
    probes its ``nprobe`` NEAREST centroids instead of the Hamming-1
    ball. Same shortlist + exact re-rank tail, same output shape.

    Why this is the production quantizer: the sign-bit cell prunes a
    corpus-INDEPENDENT (bits+1)/2^bits (50% at the default) — trained
    cells with ``n_cells=None`` (auto-scaled) probe nprobe/n_cells,
    a fraction that SHRINKS as the corpus grows, and because cells
    track the data's actual clusters the recall at that smaller scan
    is higher (measured on the fixture: the q258 gate). Training adds
    ``rounds`` corpus passes at BUILD time only; serving cost is
    |queries|·n_cells centroid distances (broadcast literals) plus
    the pruned code scan. At 100 TB the trained cell id is the
    partition column exactly as the sign-bit one was
    (ivf_pq_write_index with centroids=...).

    ``where`` restricts the CANDIDATE SCAN to rows satisfying a
    metadata predicate — PRE-filtered ANN (the vector-database
    serving staple): the predicate lands before code emission and
    ADC, so every shortlist slot is spent on a QUALIFYING row,
    whereas post-filtering an unfiltered top-k returns ~selectivity·k
    matches (the q271 gate measures exactly this). Training and the
    query side stay predicate-blind — the index is built once, the
    filter varies per request; at 100 TB a selective predicate column
    rides the same parquet scan (row-group stats / secondary
    partition dim), composing with the probe-cell prune.

    ``adapt_ratio=(num, den)`` switches the probe list to PER-QUERY
    ADAPTIVE width (``_trained_parts``): ``nprobe`` becomes the
    ceiling and farther centroids are probed only while their d2
    stays within num/den of the nearest — the serving lever that
    cuts the MEAN probed fraction without losing boundary-query
    recall (the q279 gate measures exactly this)."""
    from kinesis_producer_spark.tables import fan_out

    if centroids is None:
        centroids = train_ivf_centroids(
            corpus, n_cells=n_cells, rounds=rounds,
            id_col=id_col, emb_col=emb_col, sample_rows=sample_rows,
        )
    cell_fn, probes_fn = _trained_parts(centroids, nprobe, adapt=adapt_ratio)
    cb = (
        codebook
        if codebook is not None
        else _collect_codebook(corpus, id_col, emb_col, n_centroids)
    )
    codes_fn, qd2_fn, adist_fn = _pq_expr_parts(cb, m_dims)
    # cell assignment costs |corpus|·n_cells·dim Arrow work — spread a
    # one-split fixture across cores (no-op at real scale)
    scan = corpus if where is None else corpus.filter(where)
    coded = fan_out(scan).select(
        F.col(id_col).alias("vec_id"),
        cell_fn(F.col(emb_col)).alias("_cell"),
        codes_fn(F.col(emb_col)).alias("_codes"),
    )
    q = corpus.filter(F.col(id_col).isin(*query_ids)).select(
        F.col(id_col).alias("query_id"),
        F.explode(probes_fn(F.col(emb_col))).alias("_cell"),
        qd2_fn(F.col(emb_col)).alias("_qd2"),
    )
    cand = coded.join(F.broadcast(q), "_cell")
    return _adc_shortlist_rerank(
        corpus, cand, adist_fn, query_ids, k, shortlist, id_col, emb_col,
        exclude_self,
    )


def ivf_pq_nprobe_sweep(
    corpus: DataFrame,
    query_ids: list[int],
    sweep: tuple[int, ...] = (1, 2, 4, 8),
    k: int = 10,
    shortlist: int = 50,
    n_cells: int | None = 16,
    rounds: int = 2,
    n_centroids: int = 16,
    m_dims: int = 8,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    exclude_self: bool = False,
    centroids: list[list[int]] | None = None,
    codebook: list[list[int]] | None = None,
) -> DataFrame:
    """``ivf_pq_topk_trained`` evaluated at SEVERAL nprobe operating
    points in ONE shared scan — the parameter-sweep harness the
    recall frontier (``ivf_serving_config``) was measured with, as a
    first-class operator (the q170 LSH-sweep discipline applied to
    the IVF family). Returns (nprobe, query_id, vec_id, adist_q,
    cos_micro, rank): for each value in ``sweep``, exactly the rows
    ``ivf_pq_topk_trained(nprobe=value)`` would return (pinned in
    tests — the probe list at width v is the max-width list's first v
    entries, so truncation ≡ re-derivation).

    Scale — why one scan instead of |sweep| runs: cell assignment,
    PQ code emission, the candidate join and the ADC lookup sum are
    all computed ONCE at the widest probe width; sweep membership is
    a post-ADC array-filter explode (a vector's cell has one rank in
    a query's probe list, so a candidate belongs to every sweep value
    above that rank — pure expression, no extra scan, no re-join).
    Only the per-(nprobe, query) top-``shortlist`` window and the
    ≤|sweep|·|queries|·shortlist re-rank rows multiply. At 100 TB the
    sweep reads the max-width probe partitions once; |sweep| separate
    runs would re-read (and re-encode) them |sweep| times."""
    from kinesis_producer_spark.tables import fan_out

    sweep_vals = sorted({int(s) for s in sweep})
    if centroids is None:
        centroids = train_ivf_centroids(
            corpus, n_cells=n_cells, rounds=rounds,
            id_col=id_col, emb_col=emb_col,
        )
    max_np = min(max(sweep_vals), len(centroids))
    cell_fn, probes_fn = _trained_parts(centroids, max_np)
    cb = (
        codebook
        if codebook is not None
        else _collect_codebook(corpus, id_col, emb_col, n_centroids)
    )
    codes_fn, qd2_fn, adist_fn = _pq_expr_parts(cb, m_dims)
    coded = fan_out(corpus).select(
        F.col(id_col).alias("vec_id"),
        cell_fn(F.col(emb_col)).alias("_cell"),
        codes_fn(F.col(emb_col)).alias("_codes"),
    )
    q = corpus.filter(F.col(id_col).isin(*query_ids)).select(
        F.col(id_col).alias("query_id"),
        F.posexplode(probes_fn(F.col(emb_col))).alias("_prank", "_cell"),
        qd2_fn(F.col(emb_col)).alias("_qd2"),
    )
    cand = coded.join(F.broadcast(q), "_cell")
    # ADC once per (query, candidate) — BEFORE the sweep fan-out
    scored1 = cand.select(
        "query_id",
        "vec_id",
        "_prank",
        adist_fn(F.col("_codes"), F.col("_qd2")).alias("adist_q"),
    )
    sweep_arr = F.array(*[F.lit(s) for s in sweep_vals])
    fanned = scored1.withColumn(
        "nprobe",
        F.explode(F.filter(sweep_arr, lambda s: s > F.col("_prank"))),
    )
    # shared shortlist + re-rank tail, keyed by (nprobe, query_id) —
    # the tie-break rules live in ONE place (round-9 ADVICE)
    return _adc_shortlist_rerank(
        corpus, fanned, None, query_ids, k, shortlist, id_col, emb_col,
        exclude_self, extra_keys=("nprobe",),
    )


def ivf_cell_balance(
    corpus: DataFrame,
    n_cells: int | None = None,
    rounds: int = 2,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    centroids: list[list[int]] | None = None,
    sample_rows: int | None = None,
) -> DataFrame:
    """Per-cell population diagnostics for a trained coarse quantizer
    — the FAISS ``imbalance_factor`` discipline as a query: returns
    one row PER CELL (empty cells included — a starved quantizer is
    exactly what this exists to surface) with (cell, n_vecs,
    load_ppm) where load_ppm = ⌊10⁶ · n_vecs · n_cells / N⌋, i.e.
    1 000 000 ≡ a perfectly balanced cell. At serving time a query's
    latency is the size of its probed cells, so the load tail IS the
    p99: a cell at load 20× means every query probing it scans 20×
    the balanced share (FAISS prints the same statistic after
    training for the same reason). The imbalance factor
    Σ nᵢ²·C/N² is one aggregate over this frame.

    Scale: ONE zero-shuffle Arrow assignment pass + one
    map-side-combinable count per cell (n_cells rows, bounded control
    data); the cell list is a broadcast-range left join so empty
    cells appear with n_vecs = 0. N comes from one count() action —
    the caller usually already has it (ivf_serving_config takes it)."""
    if centroids is None:
        centroids = train_ivf_centroids(
            corpus, n_cells=n_cells, rounds=rounds,
            id_col=id_col, emb_col=emb_col, sample_rows=sample_rows,
        )
    n_c = len(centroids)
    total = corpus.count()
    cell_fn, _ = _trained_parts(centroids)
    counts = (
        corpus.select(cell_fn(F.col(emb_col)).alias("cell"))
        .groupBy("cell")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_vecs"))
    )
    spark = corpus.sparkSession
    allc = spark.range(n_c).select(F.col("id").cast("int").alias("cell"))
    return (
        allc.join(counts, "cell", "left")
        .select(
            "cell",
            F.coalesce(F.col("n_vecs"), F.lit(0).cast("bigint")).alias("n_vecs"),
            F.expr(
                f"CAST(coalesce(n_vecs, 0L) * {n_c} * 1000000L"
                f" DIV {max(total, 1)} AS BIGINT)"
            ).alias("load_ppm"),
        )
    )


def _collect_cell_centroids(
    corpus: DataFrame,
    bits: int,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> dict[int, list[int]]:
    """Per-cell per-dimension micro-int centroid (the q235 expression:
    one fixed-order double division then floor — integer-exact and
    oracle-reproducible), collected as driver literals: 2^bits · dim
    ints, bounded control data. One map-side-combinable aggregation
    pass over the corpus (shared machinery: _collect_centroids_by)."""
    return _collect_centroids_by(corpus, ivf_cell(F.col(emb_col), bits), emb_col)


def _pq_residual_parts(
    cb_resid: list[list[int]], centroids: dict[int, list[int]], m_dims: int
):
    """Residual-space siblings of ``_pq_expr_parts`` (true IVFADC,
    Jégou et al. 2011 §IV.B: quantize x − centroid(cell(x)), and the
    query builds a SEPARATE distance table per probed cell from
    q − centroid(probed cell)). Code assignment and query tables take
    (embedding, cell) pairs; everything stays int64 after the one
    micro quantization, so the SQL oracle reproduces every value."""
    import numpy as np
    import pandas as pd

    cmat = np.array(cb_resid, dtype=np.int64)  # (K, dim) residual codebook
    n_k, dim = cmat.shape
    n_m = dim // m_dims
    csub = cmat.reshape(n_k, n_m, m_dims)
    cen = {c: np.array(v, dtype=np.int64) for c, v in centroids.items()}
    zero = np.zeros(dim, dtype=np.int64)

    def _resid(embs: pd.Series, cells: pd.Series) -> "np.ndarray":
        v = np.stack([np.asarray(e, dtype=np.float64) for e in embs])
        vm = np.floor(1e6 * v + 0.5).astype(np.int64)
        # a probed cell with no residents has no centroid; its table
        # is never joined to a candidate, so any value works — zeros
        # keep the batch vectorized
        cm = np.stack([cen.get(int(c), zero) for c in cells])
        return vm - cm

    def _sd2(rm: "np.ndarray") -> "np.ndarray":
        rsub = rm.reshape(len(rm), n_m, m_dims)
        out = np.empty((len(rm), n_k, n_m), dtype=np.int64)
        for m in range(n_m):
            diff = rsub[:, None, m, :] - csub[None, :, m, :]
            out[:, :, m] = (diff * diff).sum(axis=2)
        return out

    def _codes(embs, cells):
        if len(embs) == 0:
            return pd.Series([], dtype=object)
        codes = _sd2(_resid(embs, cells)).argmin(axis=1).astype(np.int32)
        return pd.Series(list(codes))

    def _qd2(embs, cells):
        if len(embs) == 0:
            return pd.Series([], dtype=object)
        sd2 = _sd2(_resid(embs, cells))
        return pd.Series(list(sd2.transpose(0, 2, 1).reshape(len(embs), n_m * n_k)))

    codes_udf = F.pandas_udf(_codes, "array<int>")
    qd2_udf = F.pandas_udf(_qd2, "array<bigint>")

    def codes_fn(emb: Column, cell: Column) -> Column:
        return codes_udf(emb, cell)

    def qd2_fn(emb: Column, cell: Column) -> Column:
        return qd2_udf(emb, cell)

    def adist_fn(codes_col: Column, qd2_col: Column) -> Column:
        total = None
        for m in range(n_m):
            term = F.element_at(
                qd2_col, m * n_k + F.element_at(codes_col, m + 1) + 1
            )
            total = term if total is None else total + term
        return total.cast("bigint")

    return codes_fn, qd2_fn, adist_fn


def ivf_pq_residual_topk(
    corpus: DataFrame,
    query_ids: list[int],
    k: int = 10,
    shortlist: int = 50,
    bits: int = 3,
    n_centroids: int = 16,
    m_dims: int = 8,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    exclude_self: bool = False,
) -> DataFrame:
    """IVFADC with RESIDUAL encoding — the full Jégou et al. 2011
    composition: each vector's PQ code quantizes x − centroid(cell(x))
    (residuals cluster tighter than raw vectors, so the same code
    budget buys finer quantization), and a query probing cell c
    scores against a distance table built from q − centroid(c) — one
    table PER PROBED CELL, the asymmetric part the flat composition
    (q252) skips. Shortlist + exact re-rank as in q252; returns the
    same (query_id, vec_id, adist_q, cos_micro, rank) shape.

    Scale: identical to q252 (codes ∝ probed cells, broadcast query
    tables — now (bits+1) of them per query, still tiny) plus one
    map-side-combinable centroid pass at build; centroids and the
    residual codebook are bounded driver literals."""
    import math

    centroids = _collect_cell_centroids(corpus, bits, id_col, emb_col)
    # the shared guarded gateway: a <n_centroids corpus fails with
    # _codebook_rows' explicit message, identical to _collect_codebook
    cb_rows = _codebook_rows(
        corpus, id_col, emb_col, n_centroids,
        cell_col=ivf_cell(F.col(emb_col), bits),
    )
    cb_resid = [
        [
            int(math.floor(1e6 * float(v) + 0.5)) - centroids[int(r["c"])][d]
            for d, v in enumerate(r["e"])
        ]
        for r in cb_rows
    ]
    codes_fn, qd2_fn, adist_fn = _pq_residual_parts(cb_resid, centroids, m_dims)
    coded = corpus.select(
        F.col(id_col).alias("vec_id"),
        ivf_cell(F.col(emb_col), bits).alias("_cell"),
        codes_fn(F.col(emb_col), ivf_cell(F.col(emb_col), bits)).alias("_codes"),
    )
    qc = ivf_cell(F.col(emb_col), bits)
    probes = F.array(qc, *[qc.bitwiseXOR(F.lit(1 << i)) for i in range(bits)])
    q = (
        corpus.filter(F.col(id_col).isin(*query_ids))
        .select(
            F.col(id_col).alias("query_id"),
            F.col(emb_col).alias("_qe"),
            F.explode(probes).alias("_cell"),
        )
        .select(
            "query_id",
            "_cell",
            qd2_fn(F.col("_qe"), F.col("_cell")).alias("_qd2"),
        )
    )
    cand = coded.join(F.broadcast(q), "_cell")
    return _adc_shortlist_rerank(
        corpus, cand, adist_fn, query_ids, k, shortlist, id_col, emb_col,
        exclude_self,
    )


def ivf_pq_residual_topk_trained(
    corpus: DataFrame,
    query_ids: list[int],
    k: int = 10,
    shortlist: int = 50,
    n_cells: int | None = 16,
    nprobe: int = 2,
    rounds: int = 2,
    n_centroids: int = 16,
    m_dims: int = 8,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    exclude_self: bool = False,
    centroids: list[list[int]] | None = None,
    pq_codebook: list[list[int]] | None = None,
) -> DataFrame:
    """The COMPLETE Jégou et al. 2011 IVFADC: trained k-means coarse
    quantizer (q257's) AND residual PQ encoding (q256's) composed —
    each vector's code quantizes x − centroid(cell(x)) where the
    centroid IS the trained coarse centroid (no separate per-cell
    mean pass: with a trained quantizer the coarse reproduction value
    is the centroid itself, which is the paper's construction), and a
    query probing cell c scores against a table built from
    q − centroid(c), one table per probed cell. q256 and q257 each
    did half of this; this is the production index shape.

    Scale: q257's build/serve costs plus nothing — the residual
    subtraction rides the same Arrow batch as code assignment, and
    the coarse centroids are already bounded driver literals."""
    if centroids is None:
        centroids = train_ivf_centroids(
            corpus, n_cells=n_cells, rounds=rounds,
            id_col=id_col, emb_col=emb_col,
        )
    import math

    cell_fn, probes_fn = _trained_parts(centroids, nprobe)
    cen_dict = {i: list(v) for i, v in enumerate(centroids)}
    if pq_codebook is not None:
        # a RESIDUAL-space codebook (train_pq_codebooks(centroids=...))
        # — the full trained composition: trained cells + sub-codebooks
        # trained on the residuals those cells induce
        cb_resid = pq_codebook
    else:
        cb_rows = _codebook_rows(
            corpus, id_col, emb_col, n_centroids,
            cell_col=cell_fn(F.col(emb_col)),
        )
        cb_resid = [
            [
                int(math.floor(1e6 * float(v) + 0.5)) - cen_dict[int(r["c"])][d]
                for d, v in enumerate(r["e"])
            ]
            for r in cb_rows
        ]
    codes_fn, qd2_fn, adist_fn = _pq_residual_parts(cb_resid, cen_dict, m_dims)
    from kinesis_producer_spark.tables import fan_out

    # project _cell ONCE and feed the materialized column into the code
    # UDF — nesting cell_fn inside codes_fn's argument would evaluate
    # the |corpus|·n_cells centroid-distance work twice (round-8 ADVICE);
    # fan_out spreads the one-split fixture (no-op at scale)
    coded = fan_out(corpus).select(
        F.col(id_col).alias("vec_id"),
        F.col(emb_col).alias("_e"),
        cell_fn(F.col(emb_col)).alias("_cell"),
    ).select(
        "vec_id",
        "_cell",
        codes_fn(F.col("_e"), F.col("_cell")).alias("_codes"),
    )
    q = (
        corpus.filter(F.col(id_col).isin(*query_ids))
        .select(
            F.col(id_col).alias("query_id"),
            F.col(emb_col).alias("_qe"),
            F.explode(probes_fn(F.col(emb_col))).alias("_cell"),
        )
        .select(
            "query_id",
            "_cell",
            qd2_fn(F.col("_qe"), F.col("_cell")).alias("_qd2"),
        )
    )
    cand = coded.join(F.broadcast(q), "_cell")
    return _adc_shortlist_rerank(
        corpus, cand, adist_fn, query_ids, k, shortlist, id_col, emb_col,
        exclude_self,
    )


def ivf_pq_write_index(
    corpus: DataFrame,
    path: str,
    bits: int = 3,
    n_centroids: int = 16,
    m_dims: int = 8,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    centroids: list[list[int]] | None = None,
    codebook: list[list[int]] | None = None,
) -> list[list[int]]:
    """Materialize the IVF×PQ index as a CELL-PARTITIONED parquet
    table (vec_id, codes array<int>) under ``path`` and return the
    codebook (the only other state a server needs — K·dim ints,
    embed it in the serving job). This is the production split
    between index BUILD (one pass over the raw corpus — the only
    time 100 TB of vectors is ever read) and SERVING
    (``ivf_pq_topk_from_index``): because ``cell`` is a physical
    partition column, a query's probe list becomes a partition
    filter and the scan reads ONLY the probed cells' code files —
    the file-prune claim in ``ivf_pq_topk``'s docstring made real
    and plan-pinned (tests assert the pruned scan's inputFiles).

    ``centroids`` switches the partitioning cell from the sign-bit
    quantizer to TRAINED centroids (train them first with
    ``train_ivf_centroids``; ship the same list to the serving job —
    the frozen-quantizer discipline, exactly like the codebook).
    ``codebook`` overrides the lowest-id codebook — pass
    ``train_pq_codebooks(...)`` to persist trained codes (q264);
    the returned value is whatever codebook the index was written
    with, which is what the serving job must embed.
    """
    cb = (
        codebook
        if codebook is not None
        else _collect_codebook(corpus, id_col, emb_col, n_centroids)
    )
    from kinesis_producer_spark.tables import fan_out

    codes_fn, _, _ = _pq_expr_parts(cb, m_dims)
    if centroids is not None:
        cell_col = _trained_parts(centroids)[0](F.col(emb_col))
    else:
        cell_col = ivf_cell(F.col(emb_col), bits)
    (
        fan_out(corpus).select(
            F.col(id_col).alias("vec_id"),
            cell_col.alias("cell"),
            codes_fn(F.col(emb_col)).alias("codes"),
        )
        # cluster rows by cell before the partitioned write: without
        # this every write task touches every populated cell dir —
        # tasks×cells small files (65k at the sf1.0 auto-scaled 2048
        # cells, 90s of file creation; round-9 soak). The shuffle
        # moves CODE rows (vec_id + cell + M ints), not raw vectors,
        # and lands ~1 file per cell — also the right layout at 100 TB
        .repartition("cell")
        .write.mode("overwrite")
        .partitionBy("cell")
        .parquet(path)
    )
    return cb


def ivf_pq_append_index(
    new_vectors: DataFrame,
    path: str,
    codebook: list[list[int]],
    bits: int = 3,
    m_dims: int = 8,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    centroids: list[list[int]] | None = None,
) -> None:
    """Incremental index maintenance — the CDC half of the ANN story
    (nobody rebuilds a 100 TB index per ingest batch, exactly as
    nobody re-dedups one, q240): encode ONLY the delta batch against
    the FROZEN build-time codebook and append its (vec_id, codes)
    rows into the existing cell partitions. Appended files land in
    the same ``cell=`` dirs, so serving keeps its partition-prune
    shape with zero rewrite of standing data; codebook drift is a
    rebuild decision (monitor with the q253 recall gate), not an
    append-path concern. ``centroids`` = the frozen TRAINED quantizer
    when the index was written with one."""
    codes_fn, _, _ = _pq_expr_parts(codebook, m_dims)
    if centroids is not None:
        cell_col = _trained_parts(centroids)[0](F.col(emb_col))
    else:
        cell_col = ivf_cell(F.col(emb_col), bits)
    (
        new_vectors.select(
            F.col(id_col).alias("vec_id"),
            cell_col.alias("cell"),
            codes_fn(F.col(emb_col)).alias("codes"),
        )
        .write.mode("append")
        .partitionBy("cell")
        .parquet(path)
    )


def ivf_pq_topk_from_index(
    corpus: DataFrame,
    index_path: str,
    codebook: list[list[int]],
    query_ids: list[int],
    k: int = 10,
    shortlist: int = 50,
    bits: int = 3,
    m_dims: int = 8,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    exclude_self: bool = False,
    centroids: list[list[int]] | None = None,
    nprobe: int = 2,
    index_df: DataFrame | None = None,
    adapt_ratio: tuple[int, int] | None = None,
) -> DataFrame:
    """Serve top-k from a PERSISTED IVF×PQ index
    (``ivf_pq_write_index``): compute the query-side probe cells and
    ADC tables from the embedded codebook, scan only the probed cell
    partitions of the code table (``cell`` is a partition column, so
    the IN-list filter prunes files before any I/O), lookup-sum the
    codes, shortlist, and re-rank exactly against the raw corpus.
    Row-identical to the in-line ``ivf_pq_topk`` (same tie-breaks).

    The probe list is driver-side control data (|queries|·(bits+1)
    ints — or |queries|·nprobe with a TRAINED quantizer — from the
    broadcast-sized query set) — that is what turns it into a
    pushable partition filter; everything corpus-sized stays
    distributed. ``centroids`` must be the index's frozen quantizer
    when it was written with one (then ``bits`` is ignored and
    ``nprobe`` sets the probe width). ``index_df`` substitutes a
    pre-constructed code-table frame for the plain parquet read —
    the streaming-maintained index passes its committed-epochs view
    (streaming/ann_index.read_committed_index) so ledger visibility
    composes with the same probe-pruned scan. ``adapt_ratio`` makes
    the probe width PER-QUERY ADAPTIVE on this production read path
    exactly as on the inline one (q278's rule — ``nprobe`` becomes
    the ceiling): the partition-filter IN-list shrinks to each
    query's geometry, which is the q278 lever where it matters most —
    fewer cell partitions opened per request."""
    spark = corpus.sparkSession
    _, qd2_fn, adist_fn = _pq_expr_parts(codebook, m_dims)
    if centroids is not None:
        probes = _trained_parts(centroids, nprobe, adapt=adapt_ratio)[1](
            F.col(emb_col)
        )
    else:
        if adapt_ratio is not None:
            # the sign-bit quantizer's probe list is the fixed xor
            # neighborhood — there is no centroid-distance ranking to
            # adapt on. Silently ignoring the lever would leave the
            # caller believing adaptive width is active (round-10
            # ADVICE); the lever is trained-quantizer-only.
            raise ValueError(
                "adapt_ratio requires a trained quantizer "
                "(centroids=...); the sign-bit path's probe list is "
                "the fixed xor neighborhood"
            )
        qc = ivf_cell(F.col(emb_col), bits)
        probes = F.array(
            qc, *[qc.bitwiseXOR(F.lit(1 << i)) for i in range(bits)]
        )
    q = corpus.filter(F.col(id_col).isin(*query_ids)).select(
        F.col(id_col).alias("query_id"),
        F.explode(probes).alias("cell"),
        qd2_fn(F.col(emb_col)).alias("_qd2"),
    )
    probe_rows = q.select("query_id", "cell").collect()  # bounded: |queries|·(bits+1)
    probe_cells = sorted({int(r["cell"]) for r in probe_rows})
    base = index_df if index_df is not None else spark.read.parquet(index_path)
    coded = base.filter(F.col("cell").isin(probe_cells))
    cand = coded.join(F.broadcast(q), "cell").withColumnRenamed("codes", "_codes")
    return _adc_shortlist_rerank(
        corpus, cand, adist_fn, query_ids, k, shortlist, id_col, emb_col,
        exclude_self,
    )


def pq_codes_and_adc_topk(
    corpus: DataFrame,
    query_ids: list[int],
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    n_centroids: int = 16,
    m_dims: int = 8,
    k: int = 10,
    exclude_self: bool = False,
    codebook: list[list[int]] | None = None,
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
    the entire point of PQ at scale.

    Plan shape (round 7): code assignment is a ZERO-SHUFFLE projection
    — the codebook is collected once (n_centroids rows, bounded
    control data) and rides into every task as literals, and each
    vector emits its M codes as ONE array<int> row instead of M·K
    exploded dim rows (the round-6 soak showed the dim explosion
    costing 16.3× shuffle for 10× data when a vector's rows straddle
    partitions; the array emission is O(n·M) bytes by construction).
    ADC is then a per-row table lookup against the broadcast query
    distance tables; the only shuffle left is the per-query top-k.

    ``codebook`` overrides the closed-form codebook — pass
    ``train_pq_codebooks(...)`` for the trained variant (q264)."""
    cb = (
        codebook
        if codebook is not None
        else _collect_codebook(corpus, id_col, emb_col, n_centroids)
    )
    codes_fn, qd2_fn, adist_fn = _pq_expr_parts(cb, m_dims)
    coded = corpus.select(
        F.col(id_col).alias("vec_id"),
        codes_fn(F.col(emb_col)).alias("_codes"),
    )
    q = corpus.filter(F.col(id_col).isin(*query_ids)).select(
        F.col(id_col).alias("query_id"),
        qd2_fn(F.col(emb_col)).alias("_qd2"),
    )
    approx = coded.crossJoin(F.broadcast(q)).select(
        "query_id",
        "vec_id",
        adist_fn(F.col("_codes"), F.col("_qd2")).alias("adist_q"),
    )
    if exclude_self:
        approx = approx.filter(F.col("vec_id") != F.col("query_id"))
    w = W.partitionBy("query_id").orderBy(F.col("adist_q").asc(), F.col("vec_id"))
    return (
        approx.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "adist_q", "rank")
    )


def sq8_train_ranges(
    corpus: DataFrame, emb_col: str = "embedding"
) -> tuple[list[int], list[int]]:
    """The SQ8 quantizer's trainable state: per-dimension micro-int
    (min, span) — ONE map-side-combinable aggregate, dim·2 ints of
    driver control data. Returned as plain int lists so it persists
    in the codebook artifact (``ann_artifacts.write_codebook(
    sq8_ranges=...)``) exactly like centroids/codebooks: at 100 TB
    the range pass runs once in the trainer job and every serving
    job loads the frozen ranges instead of re-scanning the corpus."""
    rng_rows = (
        corpus.select(F.posexplode(F.col(emb_col)).alias("d", "v"))
        .select(
            "d",
            F.floor(F.lit(1e6) * F.col("v").cast("double") + F.lit(0.5))
            .cast("bigint")
            .alias("vm"),
        )
        .groupBy("d")
        .agg(F.min("vm").alias("mn"), F.max("vm").alias("mx"))
        .collect()
    )  # bounded control data: dim rows
    dim = max(int(r["d"]) for r in rng_rows) + 1
    mn = [0] * dim
    span = [1] * dim
    for r in rng_rows:
        mn[int(r["d"])] = int(r["mn"])
        span[int(r["d"])] = max(int(r["mx"]) - int(r["mn"]), 1)
    return mn, span


def _sq8_parts(
    corpus: DataFrame,
    emb_col: str,
    ranges: tuple[list[int], list[int]] | None = None,
):
    """Shared SQ8 machinery: per-dimension [min, max] micro-int range
    (``sq8_train_ranges``, or a FROZEN ``ranges`` from the codebook
    artifact — the train-once/serve-many seam) and the
    Arrow-vectorized code/reconstruction UDFs over it. All div
    operands are non-negative, so numpy floor division, Spark
    ``div`` and DuckDB ``//`` agree."""
    import numpy as np
    import pandas as pd

    mn_l, span_l = (
        ranges if ranges is not None else sq8_train_ranges(corpus, emb_col)
    )
    mn = np.array(mn_l, dtype=np.int64)
    span = np.array(span_l, dtype=np.int64)

    def _vm(embs: pd.Series) -> "np.ndarray":
        v = np.stack([np.asarray(e, dtype=np.float64) for e in embs])
        return np.floor(1e6 * v + 0.5).astype(np.int64)

    def _codes(embs):
        if len(embs) == 0:
            return pd.Series([], dtype=object)
        c = ((_vm(embs) - mn) * 255) // span
        return pd.Series(list(c.astype(np.int32)))

    def _recon(embs):
        if len(embs) == 0:
            return pd.Series([], dtype=object)
        c = ((_vm(embs) - mn) * 255) // span
        return pd.Series(list(mn + (c * span) // 255))

    return F.pandas_udf(_codes, "array<int>"), F.pandas_udf(_recon, "array<bigint>")


def sq8_codes(
    corpus: DataFrame,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    ranges: tuple[list[int], list[int]] | None = None,
) -> DataFrame:
    """(vec_id, sq8_codes array<int>) — the persisted 64-bytes-per-
    vector payload (every element in [0, 255]; pinned in tests). One
    zero-shuffle Arrow pass, the q234 emission discipline. ``ranges``
    = frozen (mn, span) from the codebook artifact."""
    codes_udf, _ = _sq8_parts(corpus, emb_col, ranges)
    return corpus.select(
        F.col(id_col).alias("vec_id"),
        codes_udf(F.col(emb_col)).alias("sq8_codes"),
    )


def sq8_topk(
    corpus: DataFrame,
    query_ids: list[int],
    k: int = 10,
    shortlist: int = 50,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    exclude_self: bool = False,
    ranges: tuple[list[int], list[int]] | None = None,
) -> DataFrame:
    """Scalar (SQ8) quantization ANN — the OTHER production
    compression member of the family (FAISS's ScalarQuantizer QT_8bit,
    public): every dimension is independently quantized to 8 bits
    against the corpus's per-dimension [min, max] range —
    ``code_d = (vm_d − mn_d)·255 div span_d`` — so a 64-dim float
    vector becomes 64 bytes with NO codebook training, and asymmetric
    distance keeps the query exact: adist = Σ(qm_d − recon_d)² where
    ``recon_d = mn_d + code_d·span_d div 255``. Shortlist + exact
    cosine re-rank as in the PQ paths (same tail, same tie-breaks).
    PQ (q234/q252) spends its budget on trained subspace structure;
    SQ8 spends it uniformly per dimension — simpler, training-free,
    and the standard baseline PQ must beat to justify its codebooks.

    Everything is integer after the one micro quantization (all
    div operands non-negative, so Spark's truncating ``div`` and
    DuckDB's flooring ``//`` agree), oracle-reproducible.

    Scale: the range frame is dim·2 ints — a bounded one-aggregate
    collect (map-side combinable min/max); code emission is one
    zero-shuffle Arrow pass (the q234 discipline: one array per
    vector, no dim explosion); the flat code scan is n·|queries|
    zip_with sums — compose with the IVF cell (q252's pruning) when
    the corpus outgrows a flat scan, exactly as PQ does. ``ranges``
    = frozen (mn, span) from the codebook artifact (train-once /
    serve-many; q281's seam)."""
    _, recon_udf = _sq8_parts(corpus, emb_col, ranges)
    qm_col = F.transform(
        F.col(emb_col),
        lambda x: F.floor(F.lit(1e6) * x.cast("double") + F.lit(0.5)).cast(
            "bigint"
        ),
    )
    # the shared shortlist/re-rank tail wants (_codes, _qd2, adist_fn);
    # for SQ8 the "codes" the distance consumes are the reconstructed
    # int64 vector and the "query table" is the exact micro query —
    # adist is the straight zip_with squared-L2 between them
    coded = corpus.select(
        F.col(id_col).alias("vec_id"),
        recon_udf(F.col(emb_col)).alias("_codes"),
    )
    q = corpus.filter(F.col(id_col).isin(*query_ids)).select(
        F.col(id_col).alias("query_id"),
        qm_col.alias("_qd2"),
    )
    cand = coded.crossJoin(F.broadcast(q))

    def adist_fn(recon_col: Column, qm: Column) -> Column:
        diffs = F.zip_with(qm, recon_col, lambda a, b: (a - b) * (a - b))
        return F.aggregate(
            diffs, F.lit(0).cast("bigint"), lambda acc, p: acc + p
        )

    return _adc_shortlist_rerank(
        corpus, cand, adist_fn, query_ids, k, shortlist, id_col, emb_col,
        exclude_self,
    )


def ivf_sq8_topk(
    corpus: DataFrame,
    query_ids: list[int],
    k: int = 10,
    shortlist: int = 50,
    n_cells: int | None = None,
    nprobe: int = 2,
    rounds: int = 2,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    exclude_self: bool = False,
    centroids: list[list[int]] | None = None,
    ranges: tuple[list[int], list[int]] | None = None,
) -> DataFrame:
    """IVF×SQ8 — FAISS's ``IndexIVFScalarQuantizer`` (QT_8bit): the
    trained coarse quantizer prunes the scan to nprobe/n_cells
    (q257's cells) and the per-cell payload is the 64-byte SQ8 code
    (q263's training-free per-dimension quantization) instead of
    PQ's 4 bytes. The operating point this buys: SQ8's asymmetric
    distance is near-exact (8 bits/dim against the corpus range), so
    recall is limited only by the probe ceiling — the frontier's
    missing member between trained IVF×PQ (4 B, PQ-noise-bound) and
    flat SQ8 (64 B, 100% scan). 16× the payload of IVF×PQ for
    recall at the cell ceiling; same build passes, same pruned scan.

    Scale: q257's build/serve shape with the codebook replaced by the
    dim·2-int range frame (one map-side-combinable min/max aggregate,
    bounded driver control data); code emission is one zero-shuffle
    Arrow pass; the probed-cell scan carries 64 B/vec instead of
    4 B — still ∝ nprobe/n_cells of the corpus, and at 100 TB the
    cell id is the same partition column (ivf_pq_write_index's
    layout admits any code payload)."""
    from kinesis_producer_spark.tables import fan_out

    if centroids is None:
        centroids = train_ivf_centroids(
            corpus, n_cells=n_cells, rounds=rounds,
            id_col=id_col, emb_col=emb_col,
        )
    cell_fn, probes_fn = _trained_parts(centroids, nprobe)
    _, recon_udf = _sq8_parts(corpus, emb_col, ranges)
    qm_col = F.transform(
        F.col(emb_col),
        lambda x: F.floor(F.lit(1e6) * x.cast("double") + F.lit(0.5)).cast(
            "bigint"
        ),
    )
    coded = fan_out(corpus).select(
        F.col(id_col).alias("vec_id"),
        cell_fn(F.col(emb_col)).alias("_cell"),
        recon_udf(F.col(emb_col)).alias("_codes"),
    )
    q = corpus.filter(F.col(id_col).isin(*query_ids)).select(
        F.col(id_col).alias("query_id"),
        F.explode(probes_fn(F.col(emb_col))).alias("_cell"),
        qm_col.alias("_qd2"),
    )
    cand = coded.join(F.broadcast(q), "_cell")

    def adist_fn(recon_col: Column, qm: Column) -> Column:
        diffs = F.zip_with(qm, recon_col, lambda a, b: (a - b) * (a - b))
        return F.aggregate(
            diffs, F.lit(0).cast("bigint"), lambda acc, p: acc + p
        )

    return _adc_shortlist_rerank(
        corpus, cand, adist_fn, query_ids, k, shortlist, id_col, emb_col,
        exclude_self,
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
