"""Concatenated-document splitter (SURVEY.md §2a row 8).

The reference stores many XML documents concatenated in one object and
splits on the closing tag, dropping blank fragments and re-appending
the tag (reference file_flattener.py:47-55). Here that is pure
JVM-side column algebra — ``split`` + ``explode`` + ``filter`` +
``concat`` — one codegen stage, no Python, no shuffle: at 100 TB each
input blob explodes within its own task.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def split_concatenated(
    df: DataFrame,
    blob_col: str | Column,
    end_tag: str,
    out_col: str = "payload",
) -> DataFrame:
    """One row per well-formed document found in ``blob_col``.

    Matches the reference reassembly exactly: fragment.strip() +
    "\\n" + end_tag for every non-blank fragment.
    """
    blob = F.col(blob_col) if isinstance(blob_col, str) else blob_col
    # split() takes a regex — escape the literal tag
    fragment = F.explode(F.split(blob, re.escape(end_tag), -1)).alias("_fragment")

    # Python str.strip() semantics (all whitespace, both ends) — Spark's
    # trim() strips spaces only, which would keep newline-only fragments.
    def strip_ws(c):
        return F.regexp_replace(F.regexp_replace(c, r"^\s+", ""), r"\s+$", "")

    out = (
        df.select("*", fragment)
        .filter(F.length(strip_ws(F.col("_fragment"))) > 0)
        .withColumn(out_col, F.concat(strip_ws(F.col("_fragment")), F.lit("\n" + end_tag)))
        .drop("_fragment")
    )
    return out
