"""Generate QUERIES.md: an index of every registered query — key,
implementing module, oracle kind, and the first docstring sentence.

Usage: python tools/gen_query_index.py > QUERIES.md
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def first_sentence(doc: str | None) -> str:
    if not doc:
        return ""
    text = " ".join(doc.split())
    for stop in (". ", ".\n"):
        i = text.find(stop)
        if i != -1:
            return text[: i + 1]
    return text[:160]


def main() -> None:
    from kinesis_producer_spark.suite import load_all

    queries, oracle = load_all()
    print("# QUERIES — registered operator index\n")
    print(f"{len(queries)} queries; {len(oracle)} oracle-checked "
          "(hash-match vs DuckDB at sf0.01), the rest rows-only "
          "(multimodal decode stubs).\n")
    print("| query | module | oracle | what it does |")
    print("|---|---|---|---|")
    for name in sorted(queries):
        fn = queries[name]
        mod = fn.__module__.replace("kinesis_producer_spark.", "")
        kind = "sql" if name in oracle else "rows-only"
        desc = first_sentence(fn.__doc__).replace("|", "\\|")
        print(f"| {name} | {mod} | {kind} | {desc} |")


if __name__ == "__main__":
    main()
