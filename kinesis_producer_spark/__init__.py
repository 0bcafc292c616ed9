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

__all__ = ["get_spark"]
__version__ = "0.1.0"
