"""Schema inference + accessor codegen (SURVEY.md §2a row 29).

Dev utility mirroring the reference's scratch script
(col_generator.py:7-12): read a sample, emit a ``StructType``
constructor plus snake_case accessor lines.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def snake_case(name: str) -> str:
    s = re.sub(r"(.)([A-Z][a-z]+)", r"\1_\2", name)
    s = re.sub(r"([a-z0-9])([A-Z])", r"\1_\2", s)
    return re.sub(r"[^0-9a-zA-Z]+", "_", s).lower().strip("_")


def schema_code(df: DataFrame, var: str = "schema") -> str:
    """Source text for a StructType matching ``df.schema``."""
    lines = [f"{var} = T.StructType(["]
    for f in df.schema.fields:
        lines.append(
            f"    T.StructField({f.name!r}, T.{type(f.dataType).__name__}(), {f.nullable}),"
        )
    lines.append("])")
    return "\n".join(lines)


def accessor_code(df: DataFrame, frame_var: str = "df") -> str:
    """snake_case accessor lines, one per column."""
    return "\n".join(
        f"{snake_case(c)} = {frame_var}[{c!r}]" for c in df.columns
    )
