"""kinesis_producer_spark — a PySpark-native data-processing engine.

A from-scratch, Spark-first re-expression of the capabilities of the
reference ETL/streaming pipeline (glinerosuarez/kinesis-producer):

- archive/XML sources (tar unpacking, concatenated-document splitting)
- nested-to-relational flattening (EAV pivot with fixed and dynamic
  schemas, recursive component-hierarchy explode)
- Hive-partitioned CSV/JSON/Parquet sinks
- a Kinesis-style Structured Streaming writer (event-time paced replay,
  partition keys, per-record delivery checks, failed-subset retry)
- LLM-data-pipeline operators: dedup (exact / MinHash-LSH / SimHash /
  n-gram Jaccard / embedding cosine), similarity search, text analysis,
  multimodal binary columns.

Design rules (see SURVEY.md §7):
- DataFrame/SQL first; Catalyst is the optimizer — zero custom plan code.
- UDFs only where built-ins genuinely cannot express the semantics
  (tar member extraction, XML parse, recursive tree walk), and then as
  Arrow-batched pandas UDFs / mapInPandas, never row-at-a-time loops in
  hot paths.
- Every operator is a pure ``DataFrame -> DataFrame`` transform so plans
  compose and whole-stage codegen spans stay wide.
- No driver-side materialization: nothing in this package calls
  ``collect()`` on data-sized inputs.
"""

from kinesis_producer_spark.session import get_spark

# Explicit public API (round 5, packaging): flagship entry points are
# importable from the package root. Resolved lazily (PEP 562) so
# `import kinesis_producer_spark` stays cheap — operator modules pull
# in pandas/numpy only when first touched.
_PUBLIC = {
    "load_table": ("kinesis_producer_spark.tables", "load_table"),
    "load_tables": ("kinesis_producer_spark.tables", "load_tables"),
    "register_views": ("kinesis_producer_spark.tables", "register_views"),
    "load_all": ("kinesis_producer_spark.suite", "load_all"),
    # streaming producer
    "KinesisSink": ("kinesis_producer_spark.streaming.kinesis_sink", "KinesisSink"),
    "ShardMap": ("kinesis_producer_spark.streaming.kinesis_sink", "ShardMap"),
    "ShardRateLimiter": (
        "kinesis_producer_spark.streaming.kinesis_sink",
        "ShardRateLimiter",
    ),
    "RecordingTransport": (
        "kinesis_producer_spark.streaming.kinesis_sink",
        "RecordingTransport",
    ),
    "streaming_lsh_candidates": (
        "kinesis_producer_spark.streaming.lsh",
        "streaming_lsh_candidates",
    ),
    "sink_metrics": ("kinesis_producer_spark.streaming.monitor", "sink_metrics"),
    # dedup / similarity
    "exact_dedup": ("kinesis_producer_spark.operators.dedup", "exact_dedup"),
    "minhash_signature": ("kinesis_producer_spark.operators.dedup", "minhash_signature"),
    "lsh_candidate_pairs": (
        "kinesis_producer_spark.operators.dedup",
        "lsh_candidate_pairs",
    ),
    "minhash_dedup": ("kinesis_producer_spark.operators.dedup", "minhash_dedup"),
    "simhash16": ("kinesis_producer_spark.operators.dedup", "simhash16"),
    "connected_components": (
        "kinesis_producer_spark.operators.dedup",
        "connected_components",
    ),
    "brute_force_topk": (
        "kinesis_producer_spark.operators.similarity",
        "brute_force_topk",
    ),
    "ivf_topk": ("kinesis_producer_spark.operators.similarity", "ivf_topk"),
    # multimodal
    "decode_media": ("kinesis_producer_spark.operators.multimodal", "decode_media"),
    "resize_media": ("kinesis_producer_spark.operators.multimodal", "resize_media"),
    "decode_headers": ("kinesis_producer_spark.operators.multimodal", "decode_headers"),
    "repartition_by_bytes": (
        "kinesis_producer_spark.operators.multimodal",
        "repartition_by_bytes",
    ),
    "register_decode_kernel": (
        "kinesis_producer_spark.operators.multimodal",
        "register_decode_kernel",
    ),
}

__all__ = ["get_spark", *sorted(_PUBLIC)]
__version__ = "0.1.0"


def __getattr__(name: str):
    try:
        module, attr = _PUBLIC[name]
    except KeyError:
        raise AttributeError(f"module {__name__!r} has no attribute {name!r}") from None
    import importlib

    return getattr(importlib.import_module(module), attr)
