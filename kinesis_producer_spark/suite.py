"""Import every query module so the registry is fully populated."""

from __future__ import annotations

import importlib

from kinesis_producer_spark.registry import ORACLE, QUERIES

_MODULES = [
    "kinesis_producer_spark.operators.relational",
    "kinesis_producer_spark.operators.etl_queries",
    "kinesis_producer_spark.operators.llm_queries",
    "kinesis_producer_spark.operators.curation",
    "kinesis_producer_spark.operators.scale_ops",
    "kinesis_producer_spark.streaming.queries",
]


def load_all() -> tuple[dict, dict]:
    for m in _MODULES:
        importlib.import_module(m)
    return QUERIES, ORACLE
