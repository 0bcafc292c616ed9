"""Text analysis operators for training-data pipelines.

All pure column expressions (JVM-side, zero shuffle, codegen-friendly):
language-ID (marker-word voting), quality scoring (length/punct/
stopword ratios), token counting (whitespace + regex classes),
document fingerprinting (normalized digest + min-shingle winnowing).
Scores are integer micro-units for engine-portable comparison.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from kinesis_producer_spark.operators.dedup import shingles, words

# Marker vocabularies for the n-gram-heuristic language ID. Tiny on
# purpose: the operator is the vote/argmax machinery; swap in real
# frequency tables for production.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "a", "of", "and", "is"],
    "es": ["el", "la", "de", "que", "y"],
    "fr": ["le", "la", "et", "les", "des"],
    "de": ["der", "die", "und", "das", "ist"],
}

STOPWORDS = ["the", "a", "of", "and", "is", "to", "in"]


def lang_scores(text_col: Column | str) -> list[Column]:
    """One marker-hit count per language (deterministic, per-row)."""
    w = words(text_col)
    out = []
    for lang, markers in sorted(LANG_MARKERS.items()):
        marker_arr = F.array(*[F.lit(m) for m in markers])
        score = F.size(F.filter(w, lambda t: F.array_contains(marker_arr, t)))
        out.append(score.alias(f"score_{lang}"))
    return out


def lang_id(text_col: Column | str) -> Column:
    """argmax over marker-hit counts; ties → alphabetical; 0 hits → 'und'."""
    w = words(text_col)
    best_lang = F.lit("und")
    best_score = F.lit(0)
    # alphabetical iteration + strict > keeps the earliest max → the
    # tie-break is reproducible in SQL with the same comparison chain
    def _hits(marker_arr: Column) -> Column:
        # closure, not a default arg: a 2-arg lambda would resolve to
        # filter's (element, index) variant
        return F.size(F.filter(w, lambda t: F.array_contains(marker_arr, t)))

    for lang, markers in sorted(LANG_MARKERS.items(), reverse=True):
        score = _hits(F.array(*[F.lit(m) for m in markers]))
        best_lang = F.when(score >= F.greatest(best_score, F.lit(1)), F.lit(lang)).otherwise(
            best_lang
        )
        best_score = F.greatest(score, best_score)
    return best_lang


# GPT-2-style pre-tokenizer: an optional leading space glued onto a run
# of letters, a 1-3 digit group, or a punctuation run. Alternation order
# is honored identically by Java regex (Spark) and RE2 (DuckDB) —
# leftmost-first — so the split is engine-portable.
BPE_PRETOKEN_RE = r" ?[A-Za-z]+| ?[0-9]{1,3}| ?[^A-Za-z0-9\s]+"


def bpe_tokens(text_col: Column | str) -> Column:
    """BPE-ish subword pre-tokenization → array<string>.

    This is the deterministic pre-tokenize stage of a BPE tokenizer
    (the merge-table lookup that follows is model-specific); counting
    these units approximates LLM token counts for budgeting/filtering.
    Pure column expression — JVM regex, codegen-friendly, zero shuffle.
    """
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    return F.regexp_extract_all(c, F.lit(BPE_PRETOKEN_RE), F.lit(0))


def token_counts(text_col: Column | str) -> dict[str, Column]:
    """Whitespace tokens plus BPE-ish regex token classes."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    return {
        "ws_tokens": F.size(words(c)),
        "word_tokens": F.regexp_count(c, F.lit(r"[A-Za-z]+")),
        "digit_tokens": F.regexp_count(c, F.lit(r"[0-9]+")),
        "punct_tokens": F.regexp_count(c, F.lit(r"[^A-Za-z0-9\s]")),
    }


def quality_score_micro(text_col: Column | str) -> Column:
    """Composite quality in micro-units: favors mid-length docs with low
    punctuation density and a healthy stopword ratio."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    n_chars = F.length(c).cast("double")
    w = words(c)
    n_words = F.size(w).cast("double")
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    n_stop = F.size(F.filter(w, lambda t: F.array_contains(stop_arr, t))).cast("double")
    n_punct = F.regexp_count(c, F.lit(r"[^A-Za-z0-9\s]")).cast("double")

    len_term = F.least(n_chars / F.lit(500.0), F.lit(1.0))
    stop_term = F.least(n_stop / F.greatest(n_words, F.lit(1.0)) * 5.0, F.lit(1.0))
    punct_term = F.lit(1.0) - F.least(n_punct / F.greatest(n_chars, F.lit(1.0)) * 10.0, F.lit(1.0))
    score = (len_term + stop_term + punct_term) / F.lit(3.0)
    return F.floor(score * 1e6 + F.lit(0.5)).cast("bigint")


def fingerprint(text_col: Column | str) -> Column:
    """Digest of normalized text: lowercase, strip non-alnum, collapse ws."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    norm = F.regexp_replace(
        F.regexp_replace(F.lower(c), r"[^a-z0-9\s]", ""), r"\s+", " "
    )
    return F.md5(F.trim(norm))


def min_shingle_fingerprint(text_col: Column | str, n: int = 4) -> Column:
    """Winnowing-style content fingerprint: min md5 over word n-grams —
    stable under local edits away from the minimizing window."""
    sh = shingles(text_col, n)
    return F.array_min(F.transform(sh, F.md5))


def analyze(df: DataFrame, text_col: str = "text") -> DataFrame:
    """All text-analysis columns in one projection."""
    tc = token_counts(text_col)
    return df.select(
        "*",
        lang_id(text_col).alias("lang_pred"),
        *[c.alias(n) for n, c in tc.items()],
        quality_score_micro(text_col).alias("quality_micro"),
        fingerprint(text_col).alias("fingerprint"),
        min_shingle_fingerprint(text_col).alias("shingle_fingerprint"),
    )


# ---------------------------------------------------------------------------
# PII detection / redaction (training-data scrubbing)
# ---------------------------------------------------------------------------
# Patterns restricted to syntax valid in BOTH Java regex (Spark) and RE2
# (DuckDB oracle): no backrefs, no lookaround.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\b\d{3}-\d{3}-\d{4}\b"


def pii_counts(text_col: Column | str) -> dict[str, Column]:
    """How many email / phone spans a document contains."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    return {
        "n_emails": F.size(F.regexp_extract_all(c, F.lit(EMAIL_RE), F.lit(0))),
        "n_phones": F.size(F.regexp_extract_all(c, F.lit(PHONE_RE), F.lit(0))),
    }


def redact_pii(text_col: Column | str) -> Column:
    """Replace every email / phone span with a typed placeholder token.

    Order matters: emails first (an email never contains a phone match,
    but masking phones first could split a digit-bearing local part).
    """
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    return F.regexp_replace(
        F.regexp_replace(c, EMAIL_RE, "[EMAIL]"), PHONE_RE, "[PHONE]"
    )
