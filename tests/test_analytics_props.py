"""Property-based tests for the corpus-stats / embedding-index /
analytics queries (q122, q123, q125, q126, q127): random small inputs
written as parquet fixtures, query output vs an exact Python model.

Example counts are low because every example is a Spark job + parquet
round-trip (same convention as test_properties.py).
"""

from __future__ import annotations

import math
import os
import shutil
import sys
import tempfile

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SETTINGS = settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[
        HealthCheck.function_scoped_fixture,
        HealthCheck.too_slow,
        HealthCheck.large_base_example,
        HealthCheck.data_too_large,
    ],
)

WORD = st.text(alphabet="abcde", min_size=1, max_size=3)


def _fixture_dir(spark, name, df):
    d = tempfile.mkdtemp(prefix="sgfix_")
    df.write.mode("overwrite").parquet(os.path.join(d, f"{name}.parquet"))
    return d


# ---------------------------------------------------------------------------
# q127 sliding-window chunking: exact cover model
# ---------------------------------------------------------------------------


def _chunks_model(tokens):
    n = len(tokens)
    n_chunks = 1 if n <= 32 else math.ceil((n - 32) / 24.0) + 1
    out = []
    for k in range(int(n_chunks)):
        toks = tokens[k * 24 : min(k * 24 + 32, n)]
        out.append((k, len(toks), " ".join(toks)))
    return out


@SETTINGS
@given(docs=st.lists(st.lists(WORD, min_size=1, max_size=90), min_size=1, max_size=6))
def test_chunking_matches_model(spark, docs):
    from kinesis_producer_spark.operators.llm_queries import q127_doc_chunking

    rows = [(i, " ".join(words)) for i, words in enumerate(docs)]
    d = _fixture_dir(
        spark, "documents", spark.createDataFrame(rows, "doc_id long, text string")
    )
    try:
        got = {
            (r.doc_id, r.chunk_id): (r.n_tokens, r.chunk_text)
            for r in q127_doc_chunking(spark, d).collect()
        }
        want = {}
        for i, words in enumerate(docs):
            for k, n_tok, text in _chunks_model(words):
                want[(i, k)] = (n_tok, text)
        assert got == want
        # invariant: stride-24 chunks reassemble the original exactly
        for i, words in enumerate(docs):
            ks = sorted(k for (doc, k) in got if doc == i)
            rebuilt = []
            for k in ks:
                toks = got[(i, k)][1].split(" ")
                rebuilt.extend(toks if k == 0 else toks[8:])
            assert rebuilt == words
    finally:
        shutil.rmtree(d, ignore_errors=True)


# ---------------------------------------------------------------------------
# q122 skyline: brute-force dominance model
# ---------------------------------------------------------------------------


@SETTINGS
@given(
    pts=st.lists(
        st.tuples(st.integers(0, 8), st.integers(0, 8)), min_size=1, max_size=25
    )
)
def test_skyline_matches_bruteforce(spark, pts):
    from kinesis_producer_spark.operators.relational import q122_pareto_parts

    rows = [(i, float(p), s) for i, (p, s) in enumerate(pts)]
    d = _fixture_dir(
        spark,
        "part",
        spark.createDataFrame(rows, "p_partkey long, p_retailprice double, p_size int"),
    )
    try:
        got = sorted(r.p_partkey for r in q122_pareto_parts(spark, d).collect())
        want = sorted(
            i
            for i, (p, s) in enumerate(pts)
            if not any(
                bp <= p and bs >= s and (bp < p or bs > s) for bp, bs in pts
            )
        )
        assert got == want
    finally:
        shutil.rmtree(d, ignore_errors=True)


# ---------------------------------------------------------------------------
# q123 correlation matrix: replicate the fixed-order double formula
# ---------------------------------------------------------------------------


@SETTINGS
@given(
    data=st.lists(
        st.tuples(
            st.floats(0, 50, allow_nan=False),
            st.floats(0, 1000, allow_nan=False),
            st.floats(0, 0.125, allow_nan=False),
            st.floats(0, 0.0625, allow_nan=False),
        ),
        min_size=3,
        max_size=30,
    )
)
def test_corr_matrix_matches_model(spark, data):
    from kinesis_producer_spark.operators.relational import q123_corr_matrix

    # guarantee nonzero variance in every column
    data = data + [(1.0, 2.0, 0.01, 0.02), (40.0, 900.0, 0.09, 0.07)]
    rows = [(float(a), float(b), float(c), float(d)) for a, b, c, d in data]
    d = _fixture_dir(
        spark,
        "lineitem",
        spark.createDataFrame(
            rows,
            "l_quantity double, l_extendedprice double, l_discount double, l_tax double",
        ),
    )
    try:
        got = {
            (r.x, r.y): r.corr_micro for r in q123_corr_matrix(spark, d).collect()
        }
        q = [
            [int(math.floor(v * 1e6 + 0.5)) for v in col]
            for col in zip(*rows)
        ]
        n = len(rows)
        names = ["quantity", "extendedprice", "discount", "tax"]
        want = {}
        for i in range(4):
            for j in range(i + 1, 4):
                sx, sy = float(sum(q[i])), float(sum(q[j]))
                sxx = float(sum(v * v for v in q[i]))
                syy = float(sum(v * v for v in q[j]))
                sxy = float(sum(a * b for a, b in zip(q[i], q[j])))
                nd = float(n)
                num = nd * sxy - sx * sy
                den = math.sqrt((nd * sxx - sx * sx) * (nd * syy - sy * sy))
                want[(names[i], names[j])] = int(math.floor(1e6 * num / den + 0.5))
        assert got == want
    finally:
        shutil.rmtree(d, ignore_errors=True)


# ---------------------------------------------------------------------------
# q125 PQ assignment / q126 SRP banding: exact integer models
# ---------------------------------------------------------------------------

# hypothesis can't shrink 40×64 raw floats; draw one int seed per vector
# and expand it deterministically to 64 dims.
EMB = st.lists(st.integers(0, 2**31 - 1), min_size=17, max_size=30).map(
    lambda seeds: [
        [((s * (i + 3) + i * i * 37) % 2001 - 1000) / 1000.0 for i in range(64)]
        for s in seeds
    ]
)


def _micro(v):
    return int(math.floor(float(v) * 1e6 + 0.5))


@SETTINGS
@given(vecs=EMB)
def test_pq_assignment_matches_model(spark, vecs):
    from kinesis_producer_spark.operators.llm_queries import q125_pq_codebook

    rows = [(i, [float(x) for x in v]) for i, v in enumerate(vecs)]
    d = _fixture_dir(
        spark,
        "embeddings",
        spark.createDataFrame(rows, "vec_id long, embedding array<double>"),
    )
    try:
        got = {
            (r.subspace, r.code): r.n_vecs for r in q125_pq_codebook(spark, d).collect()
        }
        q = [[_micro(x) for x in v] for v in vecs]
        want = {}
        for vid, v in enumerate(q):
            for s in range(8):
                sub = v[s * 8 : s * 8 + 8]
                best = min(
                    range(16),
                    key=lambda c: (
                        sum((a - b) ** 2 for a, b in zip(sub, q[c][s * 8 : s * 8 + 8])),
                        c,
                    ),
                )
                want[(s, best)] = want.get((s, best), 0) + 1
        assert got == want
    finally:
        shutil.rmtree(d, ignore_errors=True)


@SETTINGS
@given(vecs=EMB)
def test_srp_banding_finds_all_close_pairs(spark, vecs):
    from kinesis_producer_spark.operators.llm_queries import (
        _SRP_SIGNS,
        q126_srp_lsh_neardup,
    )

    rows = [(i, [float(x) for x in v]) for i, v in enumerate(vecs)]
    d = _fixture_dir(
        spark,
        "embeddings",
        spark.createDataFrame(rows, "vec_id long, embedding array<double>"),
    )
    try:
        got = {
            (r.vec_a, r.vec_b): r.hamming
            for r in q126_srp_lsh_neardup(spark, d).collect()
        }
        sigs = []
        for v in vecs:
            q = [_micro(x) for x in v]
            sig = 0
            for b, signs in enumerate(_SRP_SIGNS):
                if sum(x * s for x, s in zip(q, signs)) > 0:
                    sig |= 1 << b
            sigs.append(sig)
        want = {}
        for a in range(len(sigs)):
            for b in range(a + 1, len(sigs)):
                h = bin(sigs[a] ^ sigs[b]).count("1")
                if h <= 2:
                    want[(a, b)] = h
        assert got == want
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_drift_bin_is_floor_division_for_negative_values(spark):
    """q249/q251's value bin must FLOOR-divide on both engines:
    Spark's `div` truncates toward zero, DuckDB's `//` floors — the
    explicit FLOOR(cents / 5000.0) form is what both sides now run.
    Pin the negative domain (the fixture is non-negative, so only a
    unit pin catches a regression here)."""
    import duckdb

    expr = "CAST(FLOOR(CAST(FLOOR(value * 100 + 0.5) AS BIGINT) / 5000.0) AS BIGINT)"
    values = [-123.45, -50.0, -0.01, 0.0, 0.01, 49.99, 50.0, 123.45]
    got_spark = [
        r.bin
        for r in spark.createDataFrame([(v,) for v in values], "value double")
        .selectExpr(f"{expr} AS bin")
        .collect()
    ]
    got_duck = [
        duckdb.sql(f"SELECT {expr} AS bin FROM (SELECT {v!r}::DOUBLE AS value)")
        .fetchone()[0]
        for v in values
    ]
    import math

    want = [math.floor(math.floor(v * 100 + 0.5) / 5000.0) for v in values]
    assert got_spark == want, (got_spark, want)
    assert got_duck == want, (got_duck, want)


@SETTINGS
@given(vecs=EMB)
def test_ivf_pq_topk_matches_model(spark, vecs):
    """q252's composed IVF×PQ path vs an exact integer model: sign-bit
    cells, Hamming-1 probes, PQ codes (micro-int L2, ties to lowest
    cid), ADC over probed cells only, shortlist by (adist, vec_id),
    exact quantized-cosine re-rank. Every stage reproduced in plain
    Python — pins cell pruning, the code assignment, the lookup sum,
    and both tie-breaks."""
    from kinesis_producer_spark.operators.llm_queries import q252_ivf_pq_topk

    K, MD, NM, BITS, SHORT, TOPK = 16, 8, 8, 3, 50, 10
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(vecs)]
    d = _fixture_dir(
        spark,
        "embeddings",
        spark.createDataFrame(rows, "vec_id long, embedding array<double>"),
    )
    try:
        got = {
            (r.query_id, r.rank): (r.vec_id, r.adist_q, r.cos_micro)
            for r in q252_ivf_pq_topk(spark, d).collect()
        }
        vm = [[_micro(x) for x in v] for v in vecs]
        cells = [
            sum((1 << b) for b in range(BITS) if v[b] > 0) for v in vecs
        ]
        def sd2(vid, m, cid):
            return sum(
                (vm[vid][m * MD + i] - vm[cid][m * MD + i]) ** 2
                for i in range(MD)
            )
        codes = [
            [min(range(K), key=lambda c: (sd2(vid, m, c), c)) for m in range(NM)]
            for vid in range(len(vecs))
        ]
        def qdot(a, b):
            return sum(
                int(math.floor(float(x) * float(y) * 1e12 + 0.5))
                for x, y in zip(a, b)
            )
        want = {}
        for qid in (0, 1, 2):
            probes = {cells[qid]} | {cells[qid] ^ (1 << b) for b in range(BITS)}
            cand = [vid for vid in range(len(vecs)) if cells[vid] in probes]
            adist = {
                vid: sum(sd2(qid, m, codes[vid][m]) for m in range(NM))
                for vid in cand
            }
            short = sorted(cand, key=lambda v: (adist[v], v))[:SHORT]
            nq = qdot(vecs[qid], vecs[qid])
            def cosm(vid):
                num = float(qdot(vecs[qid], vecs[vid]))
                den = math.sqrt(float(qdot(vecs[vid], vecs[vid])) * float(nq))
                return int(math.floor(1e6 * num / den + 0.5))
            cos = {vid: cosm(vid) for vid in short}
            final = sorted(short, key=lambda v: (-cos[v], v))[:TOPK]
            for rk, vid in enumerate(final, start=1):
                want[(qid, rk)] = (vid, adist[vid], cos[vid])
        assert got == want, (got, want)
    finally:
        shutil.rmtree(d, ignore_errors=True)


@SETTINGS
@given(vecs=EMB)
def test_ivf_pq_residual_topk_matches_model(spark, vecs):
    """q256's residual IVFADC vs an exact integer model: per-cell
    micro-int centroids (one double division + floor), residual
    codebook from the 16 lowest-id rows, codes by residual L2 (ties
    to lowest cid), per-PROBED-CELL query tables, shortlist by
    (adist, vec_id), exact-cosine re-rank. Pins the asymmetric
    residual step end to end."""
    from kinesis_producer_spark.operators.llm_queries import (
        q256_ivf_pq_residual_topk,
    )

    K, MD, NM, BITS, SHORT, TOPK = 16, 8, 8, 3, 50, 10
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(vecs)]
    d = _fixture_dir(
        spark,
        "embeddings",
        spark.createDataFrame(rows, "vec_id long, embedding array<double>"),
    )
    try:
        got = {
            (r.query_id, r.rank): (r.vec_id, r.adist_q, r.cos_micro)
            for r in q256_ivf_pq_residual_topk(spark, d).collect()
        }
        n = len(vecs)
        vm = [[_micro(x) for x in v] for v in vecs]
        cells = [sum((1 << b) for b in range(BITS) if v[b] > 0) for v in vecs]
        # per-cell centroid: floor(sum/count + 0.5) per dim
        cen = {}
        for c in set(cells):
            members = [vm[i] for i in range(n) if cells[i] == c]
            cen[c] = [
                int(math.floor(sum(m[d_] for m in members) / len(members) + 0.5))
                for d_ in range(64)
            ]
        rm = [[vm[i][d_] - cen[cells[i]][d_] for d_ in range(64)] for i in range(n)]
        def sd2(ra, rb, m):
            return sum(
                (ra[m * MD + i] - rb[m * MD + i]) ** 2 for i in range(MD)
            )
        codes = [
            [min(range(K), key=lambda c: (sd2(rm[vid], rm[c], m), c)) for m in range(NM)]
            for vid in range(n)
        ]
        def qdot(a, b):
            return sum(
                int(math.floor(float(x) * float(y) * 1e12 + 0.5))
                for x, y in zip(a, b)
            )
        want = {}
        for qid in (0, 1, 2):
            probes = {cells[qid]} | {cells[qid] ^ (1 << b) for b in range(BITS)}
            adist = {}
            for vid in range(n):
                pc = cells[vid]
                if pc not in probes:
                    continue
                # query residual vs the PROBED cell's centroid; the
                # codebook residual for cid is rm[cid] (ids are dense,
                # so the 16 lowest-id rows are vec_id 0..15)
                rq = [vm[qid][d_] - cen[pc][d_] for d_ in range(64)]
                adist[vid] = sum(
                    sd2(rq, rm[codes[vid][m]], m) for m in range(NM)
                )
            short = sorted(adist, key=lambda v: (adist[v], v))[:SHORT]
            nq = qdot(vecs[qid], vecs[qid])
            def cosm(vid):
                num = float(qdot(vecs[qid], vecs[vid]))
                den = math.sqrt(float(qdot(vecs[vid], vecs[vid])) * float(nq))
                return int(math.floor(1e6 * num / den + 0.5))
            cos = {vid: cosm(vid) for vid in short}
            final = sorted(short, key=lambda v: (-cos[v], v))[:TOPK]
            for rk, vid in enumerate(final, start=1):
                want[(qid, rk)] = (vid, adist[vid], cos[vid])
        assert got == want, (got, want)
    finally:
        shutil.rmtree(d, ignore_errors=True)


@SETTINGS
@given(vecs=EMB)
def test_ivf_pq_trained_topk_matches_model(spark, vecs):
    """q257's trained-quantizer path vs an exact integer model: init
    centroids = 16 lowest-id micro vectors, two Lloyd rounds (E-step
    argmin int64 L2 with ties to the lowest kcid; M-step
    floor(sum/count + 0.5) per dim, empty cells keep their previous
    centroid), final assignment, nprobe nearest-centroid probes, PQ
    codes, ADC over probed cells, shortlist by (adist, vec_id), exact
    quantized-cosine re-rank. Pins the whole training protocol plus
    both tie-breaks. (n_cells, nprobe) mirrors the registered query's
    ivf_serving_config derivation (round 9) so the model stays in
    lockstep with the serving default at ANY corpus size."""
    from kinesis_producer_spark.operators.llm_queries import (
        q257_ivf_pq_trained_topk,
    )
    from kinesis_producer_spark.operators.similarity import (
        ivf_serving_config,
    )

    K, MD, NM, SHORT, TOPK = 16, 8, 8, 50, 10
    NC, NPROBE = ivf_serving_config(len(vecs))
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(vecs)]
    d = _fixture_dir(
        spark,
        "embeddings",
        spark.createDataFrame(rows, "vec_id long, embedding array<double>"),
    )
    try:
        got = {
            (r.query_id, r.rank): (r.vec_id, r.adist_q, r.cos_micro)
            for r in q257_ivf_pq_trained_topk(spark, d).collect()
        }
        n = len(vecs)
        vm = [[_micro(x) for x in v] for v in vecs]

        def kd2(v, cm):
            return sum((a - b) ** 2 for a, b in zip(v, cm))

        def assign(cent):
            return [
                min(range(NC), key=lambda c: (kd2(vm[i], cent[c]), c))
                for i in range(n)
            ]

        cent = [list(vm[i]) for i in range(NC)]  # 16 lowest ids
        for _ in range(2):
            cells_r = assign(cent)
            new = []
            for c in range(NC):
                members = [vm[i] for i in range(n) if cells_r[i] == c]
                if not members:
                    new.append(cent[c])
                else:
                    new.append(
                        [
                            int(math.floor(
                                sum(m[d_] for m in members) / len(members) + 0.5
                            ))
                            for d_ in range(64)
                        ]
                    )
            cent = new
        cells = assign(cent)

        def sd2(vid, m, cid):
            return sum(
                (vm[vid][m * MD + i] - vm[cid][m * MD + i]) ** 2
                for i in range(MD)
            )

        codes = [
            [min(range(K), key=lambda c: (sd2(vid, m, c), c)) for m in range(NM)]
            for vid in range(n)
        ]

        def qdot(a, b):
            return sum(
                int(math.floor(float(x) * float(y) * 1e12 + 0.5))
                for x, y in zip(a, b)
            )

        want = {}
        for qid in (0, 1, 2):
            probes = set(
                sorted(range(NC), key=lambda c: (kd2(vm[qid], cent[c]), c))[:NPROBE]
            )
            cand = [vid for vid in range(n) if cells[vid] in probes]
            adist = {
                vid: sum(sd2(qid, m, codes[vid][m]) for m in range(NM))
                for vid in cand
            }
            short = sorted(cand, key=lambda v: (adist[v], v))[:SHORT]
            nq = qdot(vecs[qid], vecs[qid])

            def cosm(vid):
                num = float(qdot(vecs[qid], vecs[vid]))
                den = math.sqrt(float(qdot(vecs[vid], vecs[vid])) * float(nq))
                return int(math.floor(1e6 * num / den + 0.5))

            cos = {vid: cosm(vid) for vid in short}
            final = sorted(short, key=lambda v: (-cos[v], v))[:TOPK]
            for rk, vid in enumerate(final, start=1):
                want[(qid, rk)] = (vid, adist[vid], cos[vid])
        assert got == want, (got, want)
    finally:
        shutil.rmtree(d, ignore_errors=True)


@SETTINGS
@given(vecs=EMB)
def test_ivf_pq_trained_residual_topk_matches_model(spark, vecs):
    """q262's complete trained-residual IVFADC vs an exact integer
    model: the q257 training protocol (2 Lloyd rounds, empty cells
    keep centroids) PLUS residual codes against the trained centroids
    themselves (codebook = residuals of the 16 lowest-id rows vs
    their own cells' centroids) and per-PROBED-CELL query tables.
    Pins the full composition end to end with both tie-breaks."""
    from kinesis_producer_spark.operators.llm_queries import (
        q262_ivf_pq_trained_residual_topk,
    )

    K, MD, NM, NC, NPROBE, SHORT, TOPK = 16, 8, 8, 16, 2, 50, 10
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(vecs)]
    d = _fixture_dir(
        spark,
        "embeddings",
        spark.createDataFrame(rows, "vec_id long, embedding array<double>"),
    )
    try:
        got = {
            (r.query_id, r.rank): (r.vec_id, r.adist_q, r.cos_micro)
            for r in q262_ivf_pq_trained_residual_topk(spark, d).collect()
        }
        n = len(vecs)
        vm = [[_micro(x) for x in v] for v in vecs]

        def kd2(v, cm):
            return sum((a - b) ** 2 for a, b in zip(v, cm))

        def assign(cent):
            return [
                min(range(NC), key=lambda c: (kd2(vm[i], cent[c]), c))
                for i in range(n)
            ]

        cent = [list(vm[i]) for i in range(NC)]
        for _ in range(2):
            cells_r = assign(cent)
            new = []
            for c in range(NC):
                members = [vm[i] for i in range(n) if cells_r[i] == c]
                if not members:
                    new.append(cent[c])
                else:
                    new.append(
                        [
                            int(math.floor(
                                sum(m[d_] for m in members) / len(members) + 0.5
                            ))
                            for d_ in range(64)
                        ]
                    )
            cent = new
        cells = assign(cent)
        # residuals vs the trained centroid of each vector's OWN cell
        rm = [
            [vm[i][d_] - cent[cells[i]][d_] for d_ in range(64)]
            for i in range(n)
        ]

        def sd2(ra, rb, m):
            return sum(
                (ra[m * MD + i] - rb[m * MD + i]) ** 2 for i in range(MD)
            )

        codes = [
            [
                min(range(K), key=lambda c: (sd2(rm[vid], rm[c], m), c))
                for m in range(NM)
            ]
            for vid in range(n)
        ]

        def qdot(a, b):
            return sum(
                int(math.floor(float(x) * float(y) * 1e12 + 0.5))
                for x, y in zip(a, b)
            )

        want = {}
        for qid in (0, 1, 2):
            probes = set(
                sorted(range(NC), key=lambda c: (kd2(vm[qid], cent[c]), c))[:NPROBE]
            )
            adist = {}
            for vid in range(n):
                pc = cells[vid]
                if pc not in probes:
                    continue
                rq = [vm[qid][d_] - cent[pc][d_] for d_ in range(64)]
                adist[vid] = sum(
                    sd2(rq, rm[codes[vid][m]], m) for m in range(NM)
                )
            short = sorted(adist, key=lambda v: (adist[v], v))[:SHORT]
            nq = qdot(vecs[qid], vecs[qid])

            def cosm(vid):
                num = float(qdot(vecs[qid], vecs[vid]))
                den = math.sqrt(float(qdot(vecs[vid], vecs[vid])) * float(nq))
                return int(math.floor(1e6 * num / den + 0.5))

            cos = {vid: cosm(vid) for vid in short}
            final = sorted(short, key=lambda v: (-cos[v], v))[:TOPK]
            for rk, vid in enumerate(final, start=1):
                want[(qid, rk)] = (vid, adist[vid], cos[vid])
        assert got == want, (got, want)
    finally:
        shutil.rmtree(d, ignore_errors=True)


@SETTINGS
@given(vecs=EMB)
def test_sq8_topk_matches_model(spark, vecs):
    """q263's SQ8 path vs an exact integer model: per-dimension
    [min, max] micro range, 8-bit floor-division codes, per-dim
    reconstruction, asymmetric squared-L2 against the exact micro
    query, shortlist by (adist, vec_id), exact-cosine re-rank."""
    from kinesis_producer_spark.operators.llm_queries import (
        q263_sq8_scalar_quantization_topk,
    )

    SHORT, TOPK = 50, 10
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(vecs)]
    d = _fixture_dir(
        spark,
        "embeddings",
        spark.createDataFrame(rows, "vec_id long, embedding array<double>"),
    )
    try:
        got = {
            (r.query_id, r.rank): (r.vec_id, r.adist_q, r.cos_micro)
            for r in q263_sq8_scalar_quantization_topk(spark, d).collect()
        }
        n = len(vecs)
        vm = [[_micro(x) for x in v] for v in vecs]
        mn = [min(vm[i][d_] for i in range(n)) for d_ in range(64)]
        mx = [max(vm[i][d_] for i in range(n)) for d_ in range(64)]
        span = [max(mx[d_] - mn[d_], 1) for d_ in range(64)]
        recon = [
            [
                mn[d_]
                + (((vm[i][d_] - mn[d_]) * 255) // span[d_]) * span[d_] // 255
                for d_ in range(64)
            ]
            for i in range(n)
        ]

        def qdot(a, b):
            return sum(
                int(math.floor(float(x) * float(y) * 1e12 + 0.5))
                for x, y in zip(a, b)
            )

        want = {}
        for qid in (0, 1, 2):
            adist = {
                vid: sum(
                    (vm[qid][d_] - recon[vid][d_]) ** 2 for d_ in range(64)
                )
                for vid in range(n)
            }
            short = sorted(adist, key=lambda v: (adist[v], v))[:SHORT]
            nq = qdot(vecs[qid], vecs[qid])

            def cosm(vid):
                num = float(qdot(vecs[qid], vecs[vid]))
                den = math.sqrt(float(qdot(vecs[vid], vecs[vid])) * float(nq))
                return int(math.floor(1e6 * num / den + 0.5))

            cos = {vid: cosm(vid) for vid in short}
            final = sorted(short, key=lambda v: (-cos[v], v))[:TOPK]
            for rk, vid in enumerate(final, start=1):
                want[(qid, rk)] = (vid, adist[vid], cos[vid])
        assert got == want, (got, want)
    finally:
        shutil.rmtree(d, ignore_errors=True)


def _pq_lloyd_model(vm, K=16, MD=8, NM=8, rounds=2):
    """Plain-Python per-subspace Lloyd (round-9 q264 protocol): init =
    the K lowest-id micro rows (callers pass vm in id order), E-step =
    per-(vec, m) argmin int64 subspace L2 with ties to the lowest cid,
    M-step = floor(sum/count + 0.5) per (cid, dim), empty (cid, m)
    cells keep their previous sub-centroid."""
    cb = [list(vm[i]) for i in range(K)]

    def sd2(vec, cen, m):
        return sum((vec[m * MD + i] - cen[m * MD + i]) ** 2 for i in range(MD))

    for _ in range(rounds):
        codes = [
            [min(range(K), key=lambda c: (sd2(v, cb[c], m), c)) for m in range(NM)]
            for v in vm
        ]
        new = [list(c) for c in cb]
        for m in range(NM):
            for k in range(K):
                members = [vm[i] for i in range(len(vm)) if codes[i][m] == k]
                if members:
                    for i in range(MD):
                        d_ = m * MD + i
                        new[k][d_] = int(
                            math.floor(
                                sum(mm[d_] for mm in members) / len(members) + 0.5
                            )
                        )
        cb = new
    return cb


@SETTINGS
@given(vecs=EMB)
def test_pq_trained_adc_topk_matches_model(spark, vecs):
    """q264's trained-PQ flat ADC vs an exact integer model: the
    per-subspace Lloyd protocol (_pq_lloyd_model) end to end — init =
    lowest-id rows (flat PQ's codebook), 2 rounds of per-subspace
    E/M steps, final codes, per-query ADC sums, top-10 by
    (adist, vec_id). Pins the whole training protocol plus the
    tie-breaks in every stage."""
    from kinesis_producer_spark.operators.llm_queries import (
        q264_pq_trained_adc_topk,
    )

    K, MD, NM, TOPK = 16, 8, 8, 10
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(vecs)]
    d = _fixture_dir(
        spark,
        "embeddings",
        spark.createDataFrame(rows, "vec_id long, embedding array<double>"),
    )
    try:
        got = {
            (r.query_id, r.rank): (r.vec_id, r.adist_q)
            for r in q264_pq_trained_adc_topk(spark, d).collect()
        }
        n = len(vecs)
        vm = [[_micro(x) for x in v] for v in vecs]
        cb = _pq_lloyd_model(vm, K=K, MD=MD, NM=NM, rounds=2)

        def sd2(vec, cen, m):
            return sum(
                (vec[m * MD + i] - cen[m * MD + i]) ** 2 for i in range(MD)
            )

        codes = [
            [min(range(K), key=lambda c: (sd2(v, cb[c], m), c)) for m in range(NM)]
            for v in vm
        ]
        want = {}
        for qid in (0, 1, 2):
            adist = {
                vid: sum(sd2(vm[qid], cb[codes[vid][m]], m) for m in range(NM))
                for vid in range(n)
            }
            final = sorted(range(n), key=lambda v: (adist[v], v))[:TOPK]
            for rk, vid in enumerate(final, start=1):
                want[(qid, rk)] = (vid, adist[vid])
        assert got == want, (got, want)
    finally:
        shutil.rmtree(d, ignore_errors=True)


@SETTINGS
@given(vecs=EMB)
def test_train_pq_codebooks_residual_matches_model(spark, vecs):
    """The RESIDUAL-space trainer (train_pq_codebooks(centroids=...),
    the q262 composition seam) vs an exact integer model: coarse cells
    from given centroids, init = residuals of the 16 lowest-id rows vs
    their OWN cells' centroids (q262's codebook construction), then 2
    per-subspace Lloyd rounds over residual sub-vectors. The coarse
    centroids come from the plain-Python q257 k-means model so only
    the new trainer is under test."""
    from kinesis_producer_spark.operators.similarity import (
        train_pq_codebooks,
    )

    K, MD, NM, NC = 16, 8, 8, 16
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(vecs)]
    d = _fixture_dir(
        spark,
        "embeddings",
        spark.createDataFrame(rows, "vec_id long, embedding array<double>"),
    )
    try:
        n = len(vecs)
        vm = [[_micro(x) for x in v] for v in vecs]

        def kd2(v, cm):
            return sum((a - b) ** 2 for a, b in zip(v, cm))

        def assign(cent):
            return [
                min(range(NC), key=lambda c: (kd2(vm[i], cent[c]), c))
                for i in range(n)
            ]

        cent = [list(vm[i]) for i in range(NC)]
        for _ in range(2):
            cells_r = assign(cent)
            new = []
            for c in range(NC):
                members = [vm[i] for i in range(n) if cells_r[i] == c]
                if not members:
                    new.append(cent[c])
                else:
                    new.append(
                        [
                            int(math.floor(
                                sum(m[d_] for m in members) / len(members) + 0.5
                            ))
                            for d_ in range(64)
                        ]
                    )
            cent = new
        cells = assign(cent)
        rm = [
            [vm[i][d_] - cent[cells[i]][d_] for d_ in range(64)]
            for i in range(n)
        ]
        want = _pq_lloyd_model(rm, K=K, MD=MD, NM=NM, rounds=2)

        e = spark.read.parquet(os.path.join(d, "embeddings.parquet"))
        got = train_pq_codebooks(
            e, n_centroids=K, m_dims=MD, rounds=2, centroids=cent
        )
        assert got == want, (got, want)
    finally:
        shutil.rmtree(d, ignore_errors=True)


@SETTINGS
@given(vecs=EMB)
def test_train_ivf_centroids_sampled_matches_model(spark, vecs):
    """The q267 bounded-sample training protocol vs an exact integer
    model: the training set is the sample_rows first ids in
    (md5(str(id)), id) order (train_sample's contract — hashlib.md5
    of the decimal string is exactly Spark's md5(CAST(id AS STRING))
    and DuckDB's md5(CAST(id AS VARCHAR))), init = the sample's
    n_cells LOWEST ids, and the Lloyd E/M rounds run over the sample
    ONLY (empty cells keep their previous centroid). Pins the whole
    sampled protocol including the md5 order and both tie-breaks."""
    import hashlib

    from kinesis_producer_spark.operators.similarity import (
        train_ivf_centroids,
    )

    NC, S = 4, 8
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(vecs)]
    e = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = train_ivf_centroids(e, n_cells=NC, rounds=2, sample_rows=S)

    n = len(vecs)
    vm = [[_micro(x) for x in v] for v in vecs]
    samp = sorted(
        range(n),
        key=lambda i: (hashlib.md5(str(i).encode()).hexdigest(), i),
    )[:S]
    init_ids = sorted(samp)[:NC]
    cent = [list(vm[i]) for i in init_ids]

    def kd2(v, cm):
        return sum((a - b) ** 2 for a, b in zip(v, cm))

    for _ in range(2):
        assign = {
            i: min(range(NC), key=lambda c: (kd2(vm[i], cent[c]), c))
            for i in samp
        }
        new = []
        for c in range(NC):
            members = [vm[i] for i in samp if assign[i] == c]
            if not members:
                new.append(cent[c])
            else:
                new.append(
                    [
                        int(math.floor(
                            sum(m[d] for m in members) / len(members) + 0.5
                        ))
                        for d in range(64)
                    ]
                )
        cent = new
    assert got == cent
