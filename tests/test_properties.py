"""Property-based tests (SURVEY.md §5.4): random inputs vs exact
Python models of the operator semantics.

Each hypothesis example builds one small DataFrame and runs the real
operator; example counts are kept low because every example is a Spark
job. Deadlines are off (JVM warmup skews timing)."""

from __future__ import annotations

import hashlib
import os
import re
import sys

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402
from pyspark.sql import types as T  # noqa: E402

SETTINGS = settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)

WORD = st.text(alphabet="abcdefgh", min_size=1, max_size=4)
NAME = st.text(alphabet="mnopqr", min_size=1, max_size=3)
VALUE = st.text(alphabet="0123456789xyz", min_size=0, max_size=5)


# ---------------------------------------------------------------------------
# EAV pivot (LAST_WIN) / melt round-trip
# ---------------------------------------------------------------------------

READINGS = st.lists(
    st.tuples(NAME, VALUE, st.one_of(st.none(), VALUE)), min_size=0, max_size=8
)


@SETTINGS
@given(rows=st.lists(READINGS, min_size=1, max_size=5))
def test_pivot_dynamic_matches_last_win_model(spark, rows):
    from kinesis_producer_spark.operators.eav_pivot import pivot_dynamic

    schema = T.StructType(
        [
            T.StructField("rid", T.IntegerType()),
            T.StructField(
                "readings",
                T.ArrayType(
                    T.StructType(
                        [
                            T.StructField("name", T.StringType()),
                            T.StructField("value", T.StringType()),
                            T.StructField("uom", T.StringType()),
                        ]
                    )
                ),
            ),
        ]
    )
    df = spark.createDataFrame(
        [(i, [(n, v, u) for n, v, u in r]) for i, r in enumerate(rows)], schema
    )
    out = {r["rid"]: r.asDict() for r in pivot_dynamic(df).collect()}

    all_names = sorted({n for r in rows for n, _, _ in r})
    for i, r in enumerate(rows):
        model: dict[str, str | None] = {}
        uoms: dict[str, str] = {}
        for n, v, u in r:  # dict assignment order = last write wins
            model[n] = v
            if u is not None:
                uoms[n] = u
        for n in all_names:
            assert out[i].get(n) == model.get(n)
        for n, u in uoms.items():
            assert out[i].get(f"{n}_UoM") == u


@SETTINGS
@given(rows=st.lists(st.tuples(VALUE, VALUE), min_size=1, max_size=6))
def test_melt_pivot_roundtrip(spark, rows):
    from kinesis_producer_spark.operators.eav_pivot import melt

    df = spark.createDataFrame(
        [(i, a, b) for i, (a, b) in enumerate(rows)], "rid int, ca string, cb string"
    )
    melted = melt(df, ["rid"], ["ca", "cb"])
    got = {(r["rid"], r["name"]): r["value"] for r in melted.collect()}
    for i, (a, b) in enumerate(rows):
        assert got[(i, "ca")] == a
        assert got[(i, "cb")] == b


# ---------------------------------------------------------------------------
# Recursive component-tree flatten: XML → adjacency list reconstruction
# ---------------------------------------------------------------------------


@st.composite
def component_tree(draw, depth=0):
    node = {
        "fields": draw(
            st.dictionaries(
                st.text(alphabet="stuv", min_size=2, max_size=3), VALUE, max_size=3
            )
        ),
        "attrs": draw(
            st.lists(
                st.tuples(NAME, st.one_of(st.none(), VALUE)), max_size=3, unique_by=lambda t: t[0]
            )
        ),
        "children": []
        if depth >= 3
        else draw(st.lists(component_tree(depth=depth + 1), max_size=2 if depth < 2 else 0)),
    }
    return node


def _assign_codes(node, counter):
    node["code"] = f"c{counter[0]}"
    counter[0] += 1
    for c in node["children"]:
        _assign_codes(c, counter)


def _render(node):
    parts = ["<component>", f"<componentCode>{node['code']}</componentCode>"]
    for k, v in node["fields"].items():
        parts.append(f"<{k}>{v}</{k}>" if v != "" else f"<{k}></{k}>")
    if node["attrs"]:
        parts.append("<componentAttributeCollection>")
        for n, v in node["attrs"]:
            if v is None:
                parts.append(f"<attr><n>{n}</n></attr>")
            else:
                parts.append(f"<attr><n>{n}</n><v>{v}</v></attr>")
        parts.append("</componentAttributeCollection>")
    if node["children"]:
        parts.append("<subcomponentCollection>")
        parts.extend(_render(c) for c in node["children"])
        parts.append("</subcomponentCollection>")
    parts.append("</component>")
    return "".join(parts)


def _edges(node, parent=None, acc=None):
    acc = acc if acc is not None else []
    acc.append((node["code"], parent))
    for c in node["children"]:
        _edges(c, node["code"], acc)
    return acc


@SETTINGS
@given(trees=st.lists(component_tree(), min_size=1, max_size=2))
def test_component_flatten_reconstructs_tree(spark, trees):
    from kinesis_producer_spark.operators.flatten import flatten_components
    from kinesis_producer_spark.sources.xml import parse_component_docs

    counter = [0]
    for t in trees:
        _assign_codes(t, counter)
    xml = (
        "<vehicleComponent><docTag>dv</docTag><componentCollection>"
        + "".join(_render(t) for t in trees)
        + "</componentCollection></vehicleComponent>"
    )
    df = spark.createDataFrame([(1, xml)], "doc_id int, payload string")
    parsed = parse_component_docs(df, "payload", mode="FAILFAST")
    flat = flatten_components(parsed, id_cols=["doc_id"])
    rows = {r["componentCode"]: r.asDict() for r in flat.collect()}

    expected_edges = [e for t in trees for e in _edges(t)]
    assert len(rows) == len(expected_edges)
    for code, parent in expected_edges:
        assert rows[code]["parent_code"] == parent
        assert rows[code]["docTag"] == "dv"  # doc attrs broadcast to every row
    for t in trees:

        def check(node):
            row = rows[node["code"]]
            for k, v in node["fields"].items():
                # empty XML element text parses as None
                assert row[k] == (v if v != "" else None)
            for n, v in node["attrs"]:
                # empty XML element text parses as None (1-element
                # attr form and <v></v> both land as null)
                assert row[n] == (v or None)
            for c in node["children"]:
                check(c)

        check(t)


# ---------------------------------------------------------------------------
# Dedup primitives vs exact Python models
# ---------------------------------------------------------------------------


@SETTINGS
@given(texts=st.lists(st.lists(WORD, min_size=1, max_size=12), min_size=1, max_size=6))
def test_shingles_and_jaccard_match_model(spark, texts):
    from kinesis_producer_spark.operators.dedup import jaccard_micro, shingles

    docs = [" ".join(ws) for ws in texts]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(docs)], "i int, text string")
    got = {r["i"]: sorted(r["s"]) for r in df.select("i", shingles("text", 2).alias("s")).collect()}
    model = {}
    for i, t in enumerate(docs):
        ws = re.split(r"\s+", t)
        model[i] = sorted(set(" ".join(ws[j : j + 2]) for j in range(len(ws) - 1)))
    assert got == model

    if len(docs) >= 2:
        a, b = set(model[0]), set(model[1])
        expect = int((1e6 * len(a & b)) / len(a | b) + 0.5) if a | b else None
        pair = spark.createDataFrame([(docs[0], docs[1])], "ta string, tb string")
        jm = pair.select(
            jaccard_micro(shingles("ta", 2), shingles("tb", 2)).alias("j")
        ).collect()[0]["j"]
        if expect is not None:
            assert jm == expect


@SETTINGS
@given(words=st.lists(WORD, min_size=1, max_size=10))
def test_simhash_matches_model(spark, words):
    from kinesis_producer_spark.operators.dedup import simhash16

    text = " ".join(words)
    tokens = re.split(r"\s+", text)
    expect = 0
    for i in range(16):
        vote = sum(
            1 if int(hashlib.md5(t.encode()).hexdigest()[i], 16) >= 8 else -1 for t in tokens
        )
        if vote > 0:
            expect |= 1 << i
    df = spark.createDataFrame([(text,)], "text string")
    got = df.select(simhash16("text").alias("s")).collect()[0]["s"]
    assert got == expect


@SETTINGS
@given(vals=st.lists(st.floats(-1e6, 1e6, allow_nan=False), min_size=1, max_size=20))
def test_dsum_matches_quantized_model(spark, vals):
    import math

    from kinesis_producer_spark.functions import dsum

    df = spark.createDataFrame([(v,) for v in vals], "x double")
    got = df.agg(dsum("x", "s")).collect()[0]["s"]
    expect = sum(math.floor(v * 10000 + 0.5) for v in vals)
    assert got == expect


def _levenshtein(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(
        st.text(alphabet="abc", min_size=24, max_size=24),
        min_size=2,
        max_size=12,
        unique=True,
    )
)
def test_passjoin_blocking_is_complete(spark, strings):
    """PassJoin candidate generation never drops a true edit-distance≤k
    pair (the pigeonhole bound) — checked against brute-force
    Levenshtein over a 3-letter alphabet, which makes near-pairs
    common enough to be non-vacuous."""
    from kinesis_producer_spark.operators.dedup import passjoin_candidate_pairs

    k = 3
    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(strings)], "doc_id long, pfx string"
    )
    cand = {
        (r["id_a"], r["id_b"])
        for r in passjoin_candidate_pairs(df, "doc_id", "pfx", k=k, slen=24).collect()
    }
    truth = {
        (i, j)
        for i in range(len(strings))
        for j in range(i + 1, len(strings))
        if _levenshtein(strings[i], strings[j]) <= k
    }
    assert truth <= cand, f"dropped true pairs: {truth - cand}"


def test_passjoin_planted_near_duplicates(spark):
    """Deterministic planted cases: distance 0..3 survive blocking and
    the verify stage; distance ≥4 is filtered by the verifier."""
    from kinesis_producer_spark.operators.dedup import passjoin_candidate_pairs

    base = "the quick brown fox jump"  # 24 chars
    variants = [
        (0, base),
        (1, base[:5] + "X" + base[6:]),           # 1 substitution
        (2, ("Z" + base)[:24]),                   # shift: 1 ins + 1 del at end
        (3, base[:3] + base[4:] + "Q"),           # del + append
        (4, "XXXX" + base[4:]),                   # 4 substitutions → out
        (5, "completely different str"),
    ]
    df = spark.createDataFrame(variants, "doc_id long, pfx string")
    cand = passjoin_candidate_pairs(df, "doc_id", "pfx", k=3, slen=24)
    verified = {
        (r["id_a"], r["id_b"])
        for r in cand.select(
            "id_a", "id_b", F.levenshtein("str_a", "str_b").alias("d")
        ).filter(F.col("d") <= 3).collect()
    }
    assert (0, 1) in verified
    assert (0, 2) in verified
    assert (0, 3) in verified
    assert (0, 4) not in verified
    assert (0, 5) not in verified


@settings(max_examples=50, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.integers(1, 2**31 - 1),
    st.integers(1, 2**31 - 1),
    st.sampled_from([1, 2, 4, 8, 16]),
    st.sampled_from([0, 2, 3, 4, 6]),
)
def test_png_header_roundtrip_property(width, height, depth, color):
    """synth(fields) → parse == fields for the full PNG IHDR domain."""
    import struct

    from kinesis_producer_spark.operators.multimodal import _PNG_CHANNELS, _parse_png_ihdr

    png = (
        b"\x89PNG\r\n\x1a\n"
        + struct.pack(">I", 13)
        + b"IHDR"
        + struct.pack(">IIBBBBB", width, height, depth, color, 0, 0, 0)
        + b"\x00\x00\x00\x00"
    )
    p = _parse_png_ihdr(png)
    assert p["width"] == width and p["height"] == height
    assert p["bit_depth"] == depth and p["color_type"] == color
    assert p["n_channels"] == _PNG_CHANNELS[color]


@settings(max_examples=50, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.integers(1, 8),
    st.integers(1, 192000),
    st.sampled_from([8, 16, 24, 32]),
    st.integers(0, 6),  # junk chunks before fmt
)
def test_wav_header_roundtrip_property(channels, rate, bits, n_junk):
    """synth(fields) → parse == fields, with arbitrary chunks (odd
    lengths included — RIFF pads to 2-byte alignment) before 'fmt '."""
    import struct

    from kinesis_producer_spark.operators.multimodal import _parse_wav_fmt

    chunks = b""
    for i in range(n_junk):
        body = bytes(i + 1)  # odd and even lengths
        chunks += b"JUNK" + struct.pack("<I", len(body)) + body + (b"\x00" if len(body) % 2 else b"")
    fmt = b"fmt " + struct.pack("<IHHIIHH", 16, 1, channels, rate, rate * channels * bits // 8, channels * bits // 8, bits)
    wav = b"RIFF" + struct.pack("<I", 4 + len(chunks) + len(fmt)) + b"WAVE" + chunks + fmt
    p = _parse_wav_fmt(wav)
    assert p is not None, "fmt chunk must be found behind junk chunks"
    assert p["n_channels"] == channels
    assert p["sample_rate"] == rate
    assert p["bits_per_sample"] == bits


@settings(max_examples=50, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.integers(1, 65535), st.integers(1, 65535), st.integers(0, 5), st.integers(1, 4))
def test_jpeg_gif_roundtrip_property(width, height, n_segments, ncomp):
    """JPEG SOF behind arbitrary marker segments; GIF screen descriptor."""
    import struct

    from kinesis_producer_spark.operators.multimodal import (
        _parse_gif_screen,
        _parse_jpeg_sof,
    )

    segs = b""
    for i in range(n_segments):
        body = bytes(i)
        segs += b"\xff\xe1" + struct.pack(">H", 2 + len(body)) + body
    sof = b"\xff\xc1" + struct.pack(">H", 8 + 3 * ncomp) + struct.pack(">BHHB", 8, height, width, ncomp) + bytes(3 * ncomp)
    j = _parse_jpeg_sof(b"\xff\xd8" + segs + sof + b"\xff\xd9")
    assert j["width"] == width and j["height"] == height and j["n_channels"] == ncomp

    depth = 1 + (width % 8)
    gif = b"GIF87a" + struct.pack("<HH", width, height) + bytes([0xF0 | (depth - 1), 0, 0])
    g = _parse_gif_screen(gif)
    assert g["width"] == width and g["height"] == height and g["bit_depth"] == depth


@settings(max_examples=40, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(
        st.tuples(st.binary(min_size=0, max_size=200), st.sampled_from("abc")),
        min_size=0,
        max_size=60,
    ),
    st.integers(64, 4096),
)
def test_kpl_aggregation_roundtrip_property(items, max_bytes):
    """aggregate→deaggregate preserves every payload and per-key order
    for arbitrary binary payloads and aggregate size limits."""
    from hypothesis import assume

    from kinesis_producer_spark.streaming.kinesis_sink import (
        AGG_MAGIC,
        aggregate_records,
        deaggregate_records,
    )

    assume(all(len(AGG_MAGIC) + 4 + len(d) <= max_bytes for d, _ in items))
    recs = [{"Data": d, "PartitionKey": k} for d, k in items]
    agg = aggregate_records(recs, max_bytes=max_bytes)
    assert all(len(a["Data"]) <= max_bytes for a in agg)
    back = deaggregate_records(agg)
    per_key_in: dict = {}
    for r in recs:
        per_key_in.setdefault(r["PartitionKey"], []).append(r["Data"])
    per_key_out: dict = {}
    for r in back:
        per_key_out.setdefault(r["PartitionKey"], []).append(r["Data"])
    assert per_key_in == per_key_out


# ---------------------------------------------------------------------------
# Span-level exact substring dedup (q226/q227 operator)
# ---------------------------------------------------------------------------


def test_exact_substring_spans_planted_passages(spark):
    """Plant one shared passage in two otherwise globally-unique
    documents: the operator must recover EXACTLY that span in each doc
    (start/end to the token) and emit nothing else. A planted run one
    token shorter than n must produce no span at all."""
    from kinesis_producer_spark.operators.dedup import exact_substring_spans

    n = 5
    passage = [f"shared{i}" for i in range(8)]  # 8-token shared passage
    short = [f"small{i}" for i in range(n - 1)]  # 4 tokens: below n
    docs = {
        0: [f"u0_{i}" for i in range(7)] + passage + [f"v0_{i}" for i in range(5)],
        1: [f"u1_{i}" for i in range(3)] + passage + [f"v1_{i}" for i in range(9)],
        2: [f"u2_{i}" for i in range(6)] + short + [f"v2_{i}" for i in range(6)],
        3: [f"u3_{i}" for i in range(2)] + short + [f"v3_{i}" for i in range(4)],
    }
    df = spark.createDataFrame(
        [(k, " ".join(v)) for k, v in docs.items()], "doc_id int, text string"
    )
    got = sorted(
        (r.doc_id, r.start_token, r.end_token, r.span_tokens)
        for r in exact_substring_spans(df, n=n, min_count=2).collect()
    )
    assert got == [(0, 7, 15, 8), (1, 3, 11, 8)]


def test_exact_substring_spans_within_one_document(spark):
    """min_count counts OCCURRENCES, not documents: a passage repeated
    inside a single doc is duplicated corpus-wide and both copies are
    spanned."""
    from kinesis_producer_spark.operators.dedup import exact_substring_spans

    rep = [f"r{i}" for i in range(5)]
    toks = rep + [f"mid{i}" for i in range(4)] + rep + ["tail0", "tail1"]
    df = spark.createDataFrame([(0, " ".join(toks))], "doc_id int, text string")
    got = sorted(
        (r.start_token, r.end_token) for r in exact_substring_spans(df, n=5).collect()
    )
    assert got == [(0, 5), (9, 14)]


@SETTINGS
@given(
    texts=st.lists(
        st.lists(st.sampled_from(["aa", "bb", "cc"]), min_size=0, max_size=12),
        min_size=1,
        max_size=5,
    )
)
def test_exact_substring_spans_and_apply_match_model(spark, texts):
    """Against a brute-force python model over a 3-word alphabet (dense
    duplicate grams, self-repeats, empty docs): spans equal the model's
    maximal duplicated-window runs, and the apply step removes exactly
    the covered tokens with an order-preserving md5."""
    import hashlib as _hl

    from kinesis_producer_spark.operators.dedup import (
        exact_substring_spans,
        substring_dedup_apply,
    )

    n = 2
    docs = [(i, " ".join(ws)) for i, ws in enumerate(texts)]
    df = spark.createDataFrame(docs, "doc_id int, text string")

    # model: global occurrence counts of positional n-grams
    from collections import Counter

    def grams(ws):
        return [" ".join(ws[j : j + n]) for j in range(len(ws) - n + 1)]

    tok = {i: (re.split(r"\s+", t) if t else [""]) for i, t in docs}
    counts = Counter(g for ws in tok.values() for g in grams(ws))
    spans_model = []
    covered_model = {}
    for i, ws in tok.items():
        marked = [p for p, g in enumerate(grams(ws)) if counts[g] >= 2]
        cov = set()
        run = []
        for p in marked:
            if run and p == run[-1] + 1:
                run.append(p)
            else:
                if run:
                    spans_model.append((i, run[0], run[-1] + n, run[-1] + n - run[0]))
                run = [p]
            cov.update(range(p, p + n))
        if run:
            spans_model.append((i, run[0], run[-1] + n, run[-1] + n - run[0]))
        covered_model[i] = cov

    got = sorted(
        (r.doc_id, r.start_token, r.end_token, r.span_tokens)
        for r in exact_substring_spans(df, n=n, min_count=2).collect()
    )
    assert got == sorted(spans_model)

    ap = {
        r.doc_id: (r.n_tokens, r.kept_tokens, r.removed_tokens, r.cleaned_md5)
        for r in substring_dedup_apply(df, n=n, min_count=2).collect()
    }
    for i, ws in tok.items():
        keep = [w for p, w in enumerate(ws) if p not in covered_model[i]]
        expect_md5 = _hl.md5(" ".join(keep).encode()).hexdigest()
        assert ap[i] == (len(ws), len(keep), len(ws) - len(keep), expect_md5)


def test_exact_substring_spans_keep_first_policy(spark):
    """keep_first=True exempts each gram's canonical occurrence: the
    first doc keeps its copy of a shared passage (no span), the second
    doc's copy is cut; an intra-doc repeat cuts only the second
    occurrence. Every duplicated gram keeps exactly one live copy."""
    from kinesis_producer_spark.operators.dedup import exact_substring_spans

    n = 5
    passage = [f"shared{i}" for i in range(8)]
    docs = {
        0: [f"u0_{i}" for i in range(7)] + passage + [f"v0_{i}" for i in range(5)],
        1: [f"u1_{i}" for i in range(3)] + passage + [f"v1_{i}" for i in range(9)],
    }
    df = spark.createDataFrame(
        [(k, " ".join(v)) for k, v in docs.items()], "doc_id int, text string"
    )
    got = sorted(
        (r.doc_id, r.start_token, r.end_token)
        for r in exact_substring_spans(df, n=n, min_count=2, keep_first=True).collect()
    )
    assert got == [(1, 3, 11)], "only the non-canonical copy is cut"

    rep = [f"r{i}" for i in range(5)]
    toks = rep + [f"mid{i}" for i in range(4)] + rep + ["tail0", "tail1"]
    df2 = spark.createDataFrame([(0, " ".join(toks))], "doc_id int, text string")
    got2 = sorted(
        (r.start_token, r.end_token)
        for r in exact_substring_spans(df2, n=5, min_count=2, keep_first=True).collect()
    )
    assert got2 == [(9, 14)], "intra-doc: only the second occurrence is cut"


def test_contamination_spans_planted(spark):
    """Planted eval passage: train docs containing it get exactly that
    span; a passage repeated across TRAIN docs only (absent from the
    eval set) is never marked — contamination is against the reference,
    not corpus-internal duplication."""
    from kinesis_producer_spark.operators.dedup import contamination_spans

    n = 4
    leak = [f"leak{i}" for i in range(6)]
    shared_train = [f"dup{i}" for i in range(6)]  # train-internal only
    train = {
        10: [f"a{i}" for i in range(5)] + leak + [f"b{i}" for i in range(3)],
        11: leak + [f"c{i}" for i in range(8)],
        12: [f"d{i}" for i in range(4)] + shared_train + [f"e{i}" for i in range(4)],
        13: shared_train + [f"f{i}" for i in range(5)],
    }
    ev = {0: [f"x{i}" for i in range(3)] + leak + [f"y{i}" for i in range(2)]}
    tdf = spark.createDataFrame(
        [(k, " ".join(v)) for k, v in train.items()], "doc_id int, text string"
    )
    edf = spark.createDataFrame(
        [(k, " ".join(v)) for k, v in ev.items()], "doc_id int, text string"
    )
    got = sorted(
        (r.doc_id, r.start_token, r.end_token, r.span_tokens)
        for r in contamination_spans(tdf, edf, n=n).collect()
    )
    assert got == [(10, 5, 11, 6), (11, 0, 6, 6)]


# ---------------------------------------------------------------------------
# q232 bigram-LM fluency / q233 DSIR importance — direction pins
# ---------------------------------------------------------------------------


def _write_documents(spark, tmp_path, rows):
    """rows: (doc_id, text, lang). Writes a minimal documents.parquet
    fixture so the (spark, sf_dir) query functions run against it."""
    df = spark.createDataFrame(
        [(i, t, lg, "src0", len(t)) for i, t, lg in rows],
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    )
    df.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(str(tmp_path), "documents.parquet")
    )
    return str(tmp_path)


def test_bigram_lm_scrambled_scores_lower(spark, tmp_path):
    """A scrambled document keeps its unigram profile but its bigrams
    fall off the corpus's conditional model: with six fluent copies of
    one sentence and one token-reversed copy, the reversed doc must
    score strictly lower avg conditional probability — the signal that
    separates the conditional LM from q113's unigram share (which ties
    the two)."""
    from kinesis_producer_spark.operators.llm_queries import q232_bigram_lm_quality

    sent = "the quick brown fox jumps over the lazy dog"
    scrambled = " ".join(reversed(sent.split()))
    rows = [(i, sent, "en") for i in range(6)] + [(6, scrambled, "en")]
    sf = _write_documents(spark, tmp_path, rows)
    got = {r.doc_id: r.avg_cond_nano for r in q232_bigram_lm_quality(spark, sf).collect()}
    assert got[6] < got[0]
    assert all(got[i] == got[0] for i in range(1, 6))


def test_dsir_importance_prefers_target_vocabulary(spark, tmp_path):
    """Importance must rank a document built from target-domain (en)
    bigrams above one built from off-target bigrams: en docs share one
    vocabulary, de docs another, and the two probe docs reuse one
    vocabulary each — the en-vocab probe's hashed features are dense in
    the target counts, the de-vocab probe's are absent from them."""
    from kinesis_producer_spark.operators.llm_queries import q233_dsir_importance

    en_text = "alpha beta gamma delta alpha beta gamma delta"
    de_text = "zorn blitz kraft wald zorn blitz kraft wald"
    rows = (
        [(i, en_text, "en") for i in range(4)]
        + [(10 + i, de_text, "de") for i in range(4)]
        + [(100, en_text, "de"), (101, de_text, "de")]
    )
    sf = _write_documents(spark, tmp_path, rows)
    got = {r.doc_id: r.importance_micro for r in q233_dsir_importance(spark, sf).collect()}
    assert got[100] > got[101]


# ---------------------------------------------------------------------------
# q234 PQ-ADC / q235 prototypicality — model pins
# ---------------------------------------------------------------------------


def test_pq_adc_matches_model(spark):
    """PQ codes + ADC top-k vs an exact integer Python model on random
    vectors: codebook = subvectors of vec_id < K, assignment by
    (sd2, cid) minimum, approximate distance = sum of the query's
    table entries over the vector's codes."""
    import numpy as np

    from kinesis_producer_spark.operators.similarity import pq_codes_and_adc_topk

    rng = np.random.default_rng(7)
    n, dim, m_dims, K, k = 40, 16, 8, 4, 5
    M = dim // m_dims
    embs = rng.normal(scale=0.3, size=(n, dim)).astype("float32")
    df = spark.createDataFrame(
        [(i, embs[i].tolist()) for i in range(n)], "vec_id bigint, embedding array<float>"
    )
    got = sorted(
        (r.query_id, r.rank, r.vec_id, r.adist_q)
        for r in pq_codes_and_adc_topk(
            df, query_ids=[0, 1], n_centroids=K, m_dims=m_dims, k=k
        ).collect()
    )

    vm = np.floor(1e6 * embs.astype(np.float64) + 0.5).astype(np.int64)
    sub = vm.reshape(n, M, m_dims)
    sd2 = np.zeros((n, M, K), dtype=np.int64)
    for c in range(K):
        sd2[:, :, c] = ((sub - sub[c][None, :, :]) ** 2).sum(-1)
    codes = np.zeros((n, M), dtype=np.int64)
    for v in range(n):
        for m in range(M):
            codes[v, m] = min(range(K), key=lambda c: (sd2[v, m, c], c))
    expect = []
    for qid in (0, 1):
        adist = [
            (sum(int(sd2[qid, m, codes[v, m]]) for m in range(M)), v) for v in range(n)
        ]
        for rank, (dist, v) in enumerate(sorted(adist), start=1):
            if rank <= k:
                expect.append((qid, rank, v, dist))
    assert got == sorted(expect)


def test_prototypicality_prune_planted_outlier(spark):
    """Four identical vectors plus one far outlier in a single cell:
    the outlier must rank last (max distance, kept) and exactly
    floor(cell_n / 4) = 1 vector — the lowest-id of the identical
    pack — is pruned."""
    from kinesis_producer_spark.operators.similarity import prototypicality_prune

    base = [0.5, 0.5, 0.5, 0.5, 0.1, -0.1]
    outlier = [0.5, 0.5, 0.5, 0.5, 3.0, 3.0]
    rows = [(i, base) for i in range(4)] + [(9, outlier)]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")
    got = {r.vec_id: (r.rank, r.cell_n, r.kept) for r in
           prototypicality_prune(df, bits=4, prune_den=4).collect()}
    assert got[9] == (5, 5, True)
    assert got[0] == (1, 5, False)
    assert [got[i][2] for i in (1, 2, 3)] == [True, True, True]


def test_filter_funnel_verdict_is_first_failing_rule(spark, tmp_path):
    """A document failing several rules reports the FIRST in chain
    order (too_short → non_target_lang → repetitive → low_stopword),
    while the flags still show every rule that would fire."""
    from kinesis_producer_spark.operators.llm_queries import q237_filter_funnel

    short_de = "kurz kurz kurz"  # too_short AND non_target_lang AND repetitive
    long_rep_de = " ".join(["wort"] * 30)  # non_target AND repetitive (not short)
    ok = "the quick brown fox is one of " + " ".join(f"w{i}" for i in range(20))
    rows = [(0, short_de, "de"), (1, long_rep_de, "de"), (2, ok, "en")]
    sf = _write_documents(spark, tmp_path, rows)
    got = {r.doc_id: r for r in q237_filter_funnel(spark, sf).collect()}
    assert got[0].verdict == "too_short"
    assert (got[0].f_non_target_lang, got[0].f_repetitive) == (1, 1)
    assert got[1].verdict == "non_target_lang"
    assert got[2].verdict == "pass"


def test_token_budget_straddler_is_admitted(spark, tmp_path):
    """The document whose cumulative predecessor total is below the
    budget is kept even when it crosses the boundary; the next one is
    cut — and the bucketed prefix sum must equal the single-window
    closed form at every row."""
    from kinesis_producer_spark.operators.llm_queries import (
        _SEL_BUDGET,
        q238_token_budget_selection,
    )

    # three docs of ~40% budget each: docs ranked by n_tokens desc
    n1 = _SEL_BUDGET * 2 // 5
    sizes = {0: n1 + 2, 1: n1 + 1, 2: n1, 3: 50}
    rows = [(i, " ".join(f"t{j}" for j in range(n)), "en") for i, n in sizes.items()]
    sf = _write_documents(spark, tmp_path, rows)
    got = {r.doc_id: (r.cum_before, r.kept) for r in
           q238_token_budget_selection(spark, sf).collect()}
    # order: 0, 1, 2, 3. cum_before: 0, n1+2, 2n1+3, 3n1+3
    assert got[0] == (0, 1)
    assert got[1] == (n1 + 2, 1)
    assert got[2] == (2 * n1 + 3, 1)  # straddles the budget: admitted
    assert got[3] == (3 * n1 + 3, 0)  # past it: cut


def test_incremental_ingest_dedup_branches(spark, tmp_path):
    """All three CDC branches: a delta doc whose key is in the index
    is dup_of_index (even if it is ALSO first in the batch); of two
    index-missing delta docs sharing a key, the lowest id is new and
    admitted, the other dup_in_batch."""
    from kinesis_producer_spark.operators.llm_queries import (
        q240_incremental_ingest_dedup,
    )

    rows = [
        (1, "a b filler one", "en"),     # index
        (2, "x y filler two", "en"),     # index
        (10, "a b something", "en"),     # delta: key in index
        (20, "c d first", "en"),         # delta: new, admitted
        (30, "c d second", "en"),        # delta: dup_in_batch
    ]
    sf = _write_documents(spark, tmp_path, rows)
    got = {r.doc_id: (r.in_index, r.admitted, r.status) for r in
           q240_incremental_ingest_dedup(spark, sf).collect()}
    assert got == {
        10: (1, 0, "dup_of_index"),
        20: (0, 1, "new"),
        30: (0, 0, "dup_in_batch"),
    }, got


def _write_embeddings(spark, tmp_path, rows):
    """rows: (vec_id, embedding list[float], label). Minimal
    embeddings.parquet fixture for the (spark, sf_dir) queries."""
    df = spark.createDataFrame(
        rows, "vec_id bigint, embedding array<float>, label int"
    )
    df.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(str(tmp_path), "embeddings.parquet")
    )
    return str(tmp_path)


def test_ann_recall_is_perfect_within_one_cell(spark, tmp_path):
    """With every vector in the same coarse cell, the single-probe
    index sees the whole corpus: recall@k must be 100 for every
    query — the upper-bound sanity the recall harness itself needs."""
    from kinesis_producer_spark.operators.llm_queries import q242_ann_recall_eval

    # all first-3 dims positive -> one cell; distinct directions
    rows = [
        (i, [1.0, 1.0, 1.0] + [float((i >> b) & 1) for b in range(5)], 0)
        for i in range(8)
    ]
    sf = _write_embeddings(spark, tmp_path, rows)
    got = q242_ann_recall_eval(spark, sf).collect()
    assert len(got) == 8
    assert all(r.recall_pct == 100 and r.n_hits == r.n_truth for r in got), got


def test_ann_recall_counts_cross_cell_misses(spark, tmp_path):
    """A true neighbor sitting across a sign boundary is invisible to
    the single-probe index and must be counted as a miss: the planted
    query's n_hits is exactly its within-cell truth overlap."""
    from kinesis_producer_spark.operators.llm_queries import q242_ann_recall_eval

    base = [1.0] * 8
    near_same_cell = [1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 0.5]
    # nearly identical direction but dim0 sign flipped -> different cell
    near_other_cell = [-0.01, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0]
    far_same_cell = [1.0, 1.0, 1.0, -1.0, -1.0, -1.0, -1.0, -1.0]
    rows = [
        (0, base, 0),
        (1, near_same_cell, 0),
        (2, near_other_cell, 0),
        (3, far_same_cell, 0),
    ]
    sf = _write_embeddings(spark, tmp_path, rows)
    got = {r.query_id: r for r in q242_ann_recall_eval(spark, sf).collect()}
    q0 = got[0]
    # truth for q0 is all 3 others; the approx probe sees only cell 7
    assert q0.n_truth == 3
    assert q0.n_hits == 2, q0  # doc 2 is the cross-cell miss
    assert q0.recall_pct == 66, q0


def test_mixture_epoch_plan_matches_integer_model(spark, tmp_path):
    """Per-source repeat rates recomputed exactly (integer model) must
    equal the operator's output for every document, including which
    docs carry the fractional extra copy (md5 hex6 draw)."""
    import hashlib
    import math

    from kinesis_producer_spark.operators.llm_queries import (
        _EPOCH_BUDGET,
        q244_mixture_epoch_plan,
    )

    sizes = {"a": [40, 60], "b": [500, 400, 100], "c": [30]}
    rows, did = [], 0
    for src, toks in sizes.items():
        for n in toks:
            rows.append((did, " ".join(f"t{j}" for j in range(n)), "en", src))
            did += 1
    df = spark.createDataFrame(
        [(i, t, lg, s, len(t)) for i, t, lg, s in rows],
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    )
    df.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(str(tmp_path), "documents.parquet")
    )
    got = {r.doc_id: r for r in q244_mixture_epoch_plan(spark, str(tmp_path)).collect()}

    src_tokens = {s: sum(t) for s, t in sizes.items()}
    w = {s: math.floor(1e6 * math.sqrt(float(n))) for s, n in src_tokens.items()}
    denom = sum(w.values())
    for i, (_, _, _, src) in enumerate([(r[0], r[1], r[2], r[3]) for r in rows]):
        tgt = (_EPOCH_BUDGET * w[src]) // denom
        n_base = tgt // src_tokens[src]
        frac_micro = (1_000_000 * (tgt % src_tokens[src])) // src_tokens[src]
        h6 = int(hashlib.md5(f"rep:{i}".encode()).hexdigest()[:6], 16)
        extra = 1 if h6 * 1_000_000 < frac_micro * 16_777_216 else 0
        r = got[i]
        assert (r.n_base, r.extra, r.n_copies) == (n_base, extra, n_base + extra), (
            i, src, r, n_base, extra,
        )


def test_curriculum_phases_are_token_equal_and_ordered(spark, tmp_path):
    """Phases partition the easy-first order contiguously and each
    phase's token mass is within one document of total/P."""
    from kinesis_producer_spark.operators.llm_queries import (
        _CURR_PHASES,
        q241_curriculum_phases,
    )

    sizes = [3, 5, 7, 11, 13, 17, 19, 23, 29, 31, 37, 41]
    rows = [(i, " ".join(f"t{j}" for j in range(n)), "en") for i, n in enumerate(sizes)]
    sf = _write_documents(spark, tmp_path, rows)
    got = sorted(
        q241_curriculum_phases(spark, sf).collect(),
        key=lambda r: (r.n_tokens, r.doc_id),
    )
    total = sum(sizes)
    # contiguous, monotone phases along the easy-first order
    assert [r.phase for r in got] == sorted(r.phase for r in got)
    assert got[0].phase == 0 and got[-1].phase == _CURR_PHASES - 1
    # each doc's phase is where its first token falls
    for r in got:
        assert r.phase == (r.cum_before * _CURR_PHASES) // total


def test_hard_negatives_exclude_same_label(spark, tmp_path):
    """An identical vector with the SAME label must never be mined; the
    closest different-label vector is rank 1."""
    from kinesis_producer_spark.operators.llm_queries import q245_hard_negative_mining

    anchor = [1.0] * 8
    rows = [
        (0, anchor, 0),
        (100, anchor, 0),                     # same label twin: excluded
        (101, [1.0] * 7 + [0.5], 1),          # closest different-label
        (102, [-1.0] * 8, 1),                 # far different-label
    ]
    sf = _write_embeddings(spark, tmp_path, rows)
    got = [r for r in q245_hard_negative_mining(spark, sf).collect() if r.anchor_id == 0]
    ids = [r.neg_id for r in sorted(got, key=lambda r: r.rnk)]
    assert 100 not in ids
    assert ids[0] == 101, ids


def test_source_calibration_diverges_from_global_threshold(spark, tmp_path):
    """A uniformly low-scoring source still contributes its top half
    under calibration while the raw global cut rejects all of it —
    and vice versa for a uniformly high source."""
    from kinesis_producer_spark.operators.llm_queries import (
        q247_source_quality_calibration,
    )

    rows = []
    # source lo: 4 docs of 10..13 tokens (all under the global 40)
    for i, n in enumerate([10, 11, 12, 13]):
        rows.append((i, " ".join(f"a{j}" for j in range(n)), "en", "lo"))
    # source hi: 4 docs of 50..53 tokens (all over the global 40)
    for i, n in enumerate([50, 51, 52, 53]):
        rows.append((10 + i, " ".join(f"b{j}" for j in range(n)), "en", "hi"))
    df = spark.createDataFrame(
        [(i, t, lg, s, len(t)) for i, t, lg, s in rows],
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    )
    df.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(str(tmp_path), "documents.parquet")
    )
    got = {r.doc_id: r for r in
           q247_source_quality_calibration(spark, str(tmp_path)).collect()}
    lo_fair = [got[i].kept_fair for i in range(4)]
    hi_fair = [got[10 + i].kept_fair for i in range(4)]
    # each source contributes exactly its top half under calibration
    assert lo_fair == [0, 0, 1, 1] and hi_fair == [0, 0, 1, 1]
    # the raw global cut keeps NONE of lo and ALL of hi
    assert all(got[i].kept_global == 0 for i in range(4))
    assert all(got[10 + i].kept_global == 1 for i in range(4))


def test_distribution_drift_flags_shifted_type_only(spark, tmp_path):
    """A type whose current-window values shift bins gets TVD 10^6
    (total); a type with the identical distribution gets 0; the
    most-drifted bin points at the shift target."""
    import datetime as dt

    from kinesis_producer_spark.operators.llm_queries import (
        q249_distribution_drift,
    )

    rows = []
    eid = 0
    for day, side in ((5, "ref"), (20, "cur")):
        ts = dt.datetime(2024, 1, day, 12, 0, 0)
        for i in range(10):
            # 'stable': value 10.0 both windows (bin 0)
            rows.append((eid, ts, 1, "stable", 10.0, "{}")); eid += 1
            # 'shifted': bin 0 in ref, bin 2 (value 120) in cur
            rows.append(
                (eid, ts, 1, "shifted", 10.0 if side == "ref" else 120.0, "{}")
            ); eid += 1
    df = spark.createDataFrame(
        rows,
        "event_id bigint, ts timestamp, user_id bigint, event_type string, "
        "value double, props string",
    )
    df.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(str(tmp_path), "events.parquet")
    )
    got = {r.event_type: r for r in q249_distribution_drift(spark, str(tmp_path)).collect()}
    assert got["stable"].tvd_micro == 0
    assert got["shifted"].tvd_micro == 1_000_000  # disjoint supports: max TVD
    assert got["shifted"].top_bin in (0, 2)  # both bins carry the full deviation
    assert got["stable"].n_ref == 10 and got["stable"].n_cur == 10


def test_html_extraction_drops_all_chrome_blocks(spark, tmp_path):
    """The cleaned text contains the document body and the heading but
    none of the chrome (nav/aside/footer/title/style) content, and the
    content ratio is consistent with the lengths."""
    from kinesis_producer_spark.operators.llm_queries import (
        q250_html_text_extraction,
    )
    import hashlib

    rows = [(7, "alpha beta gamma", "en")]
    sf = _write_documents(spark, tmp_path, rows)
    (r,) = q250_html_text_extraction(spark, sf).collect()
    # reconstruct the expected clean text for the round-7 hardened
    # page: heading + entity, body, then the planted adversarial
    # content (decoded entities, unclosed-tag text, stray-'<' prose) —
    # everything chrome (title/style/comment/nav/script/aside/footer)
    # must be gone
    expect = (
        "src0 & co alpha beta gamma <raw> &amp; 'q\" end "
        "unclosed bold math: 1 < 2 and 3 > 2"
    )
    assert r.clean_md5 == hashlib.md5(expect.encode()).hexdigest(), r
    assert r.n_clean == len(expect)
    assert r.content_ratio_micro == (1_000_000 * r.n_clean) // r.n_raw

@given(data=st.data())
@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
def test_tombstone_algebra_matches_in_order_model(spark, data):
    """Model-based check of the round-10 tombstone algebra: a random
    add/upsert/delete epoch sequence — with random crash-before-marker
    epochs replayed LATER and compactions interleaved anywhere — must
    serve exactly what a plain-Python dict applying the SAME ops in
    EPOCH-NUMBER order serves (exactly-once semantics: replay time is
    irrelevant, suppression keys off the epoch number). Every vec
    serves at most once, at the cell of the embedding its newest op
    wrote; deleted vecs serve nowhere; compaction at any interleaving
    point changes nothing observable."""
    import os
    import shutil
    import tempfile
    import uuid

    from pyspark.sql import functions as F

    from kinesis_producer_spark.operators.similarity import ivf_cell
    from kinesis_producer_spark.streaming.ann_index import (
        bootstrap_index,
        compact_index,
        index_upsert_writer,
        read_served_index,
    )

    e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    ids = list(range(15))
    pool = e.filter(F.col("vec_id") < 15).cache()
    neg = F.transform(F.col("embedding"), lambda x: -x)
    # expected cell per (id, parity): parity 0 = original embedding,
    # parity 1 = negated (each effective upsert flips)
    cell_of = {
        (r.vec_id, 0): r.c
        for r in pool.select(
            "vec_id", ivf_cell(F.col("embedding"), 3).alias("c")
        ).collect()
    }
    cell_of.update(
        {
            (r.vec_id, 1): r.c
            for r in pool.select("vec_id", ivf_cell(neg, 3).alias("c")).collect()
        }
    )

    idx = os.path.join(
        tempfile.gettempdir(), f"prop_ts_{uuid.uuid4().hex[:10]}"
    )
    try:
        base_ids = [i for i in ids if i % 2 == 1]
        cb = bootstrap_index(
            pool.filter(F.col("vec_id").isin(base_ids)), idx,
            n_centroids=4, m_dims=8, bits=3,
        )
        w = index_upsert_writer(idx, cb, bits=3, m_dims=8)

        # generation-time state chooses which parity gets WRITTEN; the
        # recorded history is the ground truth the model replays
        gen_live = {i: 0 for i in base_ids}
        history = []  # (epoch, id, op, written_parity)
        crashed = []
        n_epochs = data.draw(st.integers(2, 5), label="n_epochs")
        for ep in range(n_epochs):
            n_ops = data.draw(st.integers(1, 5), label=f"n_ops_{ep}")
            ops = []
            seen = set()
            for _ in range(n_ops):
                i = data.draw(st.sampled_from(ids), label=f"id_{ep}")
                if i in seen:  # one op per id per epoch (an epoch's rows
                    continue   # land as one dynamic overwrite)
                seen.add(i)
                if i in gen_live:
                    op = data.draw(
                        st.sampled_from(["upsert", "delete"]),
                        label=f"op_{ep}_{i}",
                    )
                else:
                    op = data.draw(
                        st.sampled_from(["add", "upsert"]),
                        label=f"op_{ep}_{i}",
                    )
                if op == "delete":
                    wp = None
                    gen_live.pop(i, None)
                else:
                    wp = (gen_live[i] ^ 1) if i in gen_live else 0
                    gen_live[i] = wp
                ops.append((i, op, wp))
                history.append((ep, i, op, wp))
            if not ops:
                continue
            batch = None
            for i, op, wp in ops:
                emb = neg if wp == 1 else F.col("embedding")
                row = pool.filter(F.col("vec_id") == i).select(
                    "vec_id",
                    (emb if op != "delete" else F.col("embedding")).alias(
                        "embedding"
                    ),
                    F.lit(op).alias("op"),
                )
                batch = row if batch is None else batch.unionByName(row)
            w(batch, ep)
            if data.draw(st.booleans(), label=f"crash_{ep}"):
                os.unlink(
                    os.path.join(idx, "_epoch_ledger", f"epoch-{ep}")
                )
                crashed.append((ep, batch))
            elif data.draw(st.booleans(), label=f"compact_{ep}"):
                compact_index(spark, idx)

        # replay crashed epochs (commits them), then a final compaction
        for ep, batch in crashed:
            w(batch, ep)
        if data.draw(st.booleans(), label="final_compact"):
            compact_index(spark, idx)

        # the MODEL: apply the recorded history in epoch-number order
        model = {i: 0 for i in base_ids}  # id -> parity of live emb
        for ep, i, op, wp in sorted(history, key=lambda t: t[0]):
            if op == "delete":
                model.pop(i, None)
            else:
                model[i] = wp
        expected = {(i, cell_of[(i, p)]) for i, p in model.items()}

        served = {
            (r.vec_id, r.cell)
            for r in read_served_index(spark, idx).collect()
        }
        assert served == expected, (sorted(served), sorted(expected))
    finally:
        shutil.rmtree(idx, ignore_errors=True)
        shutil.rmtree(idx + ".precompact", ignore_errors=True)


def test_nb_quality_classifier_direction_and_boundedness(spark):
    """The q287/q288 supervised quality classifier pinned: (1)
    DIRECTION, per document — every clean document must outscore its
    own planted degraded twin in >= 99% of pairs at BOTH fixtures
    (the classifier separates documents, not just class means); (2)
    the trained model is BOUNDED control data — exactly 2048 buckets,
    and class totals conserve the token count; (3) weights carry the
    planted signal: buckets holding degraded-only (md5-gibberish)
    tokens weigh negative, and the heaviest positive weights sit in
    buckets the corruption drains (odd-md5 clean tokens)."""
    from kinesis_producer_spark.operators.llm_queries import (
        q287_nb_quality_train,
        q288_nb_quality_score,
    )

    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        wt = q287_nb_quality_train(spark, sf).collect()
        assert len(wt) == 2048
        tok_total = sum(r.n_hq for r in wt)
        assert tok_total == sum(r.n_lq for r in wt)  # 1:1 token map
        assert any(r.w_nano > 0 for r in wt) and any(
            r.w_nano < 0 for r in wt
        )

        rows = q288_nb_quality_score(spark, sf).collect()
        clean = {r.doc_id: r.score_nano for r in rows if r.variant == "clean"}
        deg = {
            r.doc_id: r.score_nano for r in rows if r.variant == "degraded"
        }
        assert set(clean) == set(deg) and clean
        wins = sum(1 for d in clean if clean[d] > deg[d])
        assert wins >= 0.99 * len(clean), (sf, wins, len(clean))
        # n_tokens identical across variants (the corruption is 1:1)
        nt = {(r.doc_id, r.variant): r.n_tokens for r in rows}
        assert all(
            nt[(d, "clean")] == nt[(d, "degraded")] for d in clean
        )
        # calibration: within every (variant, source) group exactly
        # the top half (by percentile) is kept
        from collections import defaultdict

        groups = defaultdict(list)
        for r in rows:
            groups[(r.variant, r.source)].append(r)
        for g in groups.values():
            kept = sum(r.kept_fair for r in g)
            assert kept == sum(
                1 for r in g if r.pct_micro >= 500_000
            )
            assert 0 < kept <= len(g)
